package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.{ChainReader, TimReader}
import graft.sinks.NoiseFileWriter
import graft.analytics.Chain

/** End-to-end demo of the reference-shaped pipeline (SURVEY §7.5 minimum
  * slice): synthesize a .tim + chain directory, run
  * read → per-backend stats → chain summaries → noise-file JSON sink.
  * Usage: runMain graft.tools.PipelineDemo <workDir>
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft-demo")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(work))
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    // synthesize inputs (reference file formats, synthetic values)
    val tim = (0 until 100).map { i =>
      val mjd = BigDecimal("56000.10000000000000000") + BigDecimal(i) * BigDecimal("30.000000000000000001")
      val be = if (i % 3 == 0) "PDFB_20CM" else "CASPSR_40CM"
      f" sub$i%04d.rf 1372.0 $mjd 1.${i % 7}00 pks -f $be -group $be"
    }.mkString("FORMAT 1\n", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/J1832-0836_demo.tim"), tim)
    val chain = (0 until 2000).map { i =>
      val a = 1.0 + 0.1 * math.sin(i * 0.37) // par 0
      val g = 4.0 + 0.2 * math.cos(i * 0.13) // par 1
      s"$a $g -1.0 -2.0 0.5 0.25"
    }.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/chain_1.txt"), chain)
    NoiseFileWriter.writeParsTxt(Seq("J1832-0836_efac", "J1832-0836_red_gamma"), s"$work/pars.txt")

    // P1 slice: tim → per-backend aggregation
    val toas = TimReader.read(spark, s"$work/J1832-0836_demo.tim")
    println(s"[demo] TOAs: ${toas.count()} rows, psr=" +
      toas.select("psr").distinct().head().getString(0))
    TimReader.backendErrorStats(toas, "f").orderBy("backend").show(false)
    TimReader.tspan(toas).show(false)

    // P3 slice: chain → burn → long → per-par summaries → noise JSON
    val pars = ChainReader.readPars(spark, s"$work/pars.txt")
    val long = ChainReader.toLong(ChainReader.readChain(spark, work), pars)
    val burned = ChainReader.burned(long)
    val mode = Chain.histogramMode(burned, col("par"), col("value"), 50)
    val summary = mode.select(lit("J1832-0836").as("psr"), col("g").as("param"),
      col("mode").as("value"))
    val files = NoiseFileWriter.writeNoiseFiles(summary, work)
    println(s"[demo] wrote: ${files.mkString(", ")}")
    println(java.nio.file.Files.readString(files.head))

    // P4 slice: optimal statistic over a synthetic 10-pulsar array — a
    // pure-HD injected signal must be recovered exactly, then marginalised
    // over deterministic draws and binned (results.py §3.3 flow).
    import graft.os.OptimalStatistic
    val psrs = (0 until 10).map(i =>
      (f"J$i%04d+0000", i.toLong, i * 2 * math.Pi / 10, (i % 5 - 2) * 0.3))
      .toDF("psr", "idx", "ra", "dec")
    val pairs = OptimalStatistic.withOrf(OptimalStatistic.pairs(psrs), "hd")
    val injected = pairs.withColumn("rho", lit(2.5e-30) * col("orf"))
      .withColumn("sig", lit(1e-30))
    OptimalStatistic.osEstimate(injected).show(false)
    val draws = (0 until 4).map(d => injected
      .withColumn("draw", lit(d))
      .withColumn("rho", col("rho") * (lit(1.0) + lit(0.1) * d)))
      .reduce(_ unionByName _)
    OptimalStatistic.marginalise(draws).show(false)
    OptimalStatistic.binned(injected, 5).orderBy("tile").show(false)
    graft.sinks.InfoSinks.writeOsResults(injected, s"$work/os_results.parquet")
    println(s"[demo] OS results parquet rows: " +
      spark.read.parquet(s"$work/os_results.parquet").count())
    spark.stop()
  }
}
