package graft.sinks

import graft.SparkTestBase
import graft.core.Tables

class CorpusExportSpec extends SparkTestBase {

  test("export partitions by lang, bounds files, and round-trips exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = tmpDir("corpus-export").toString
    CorpusExport.write(docs, out, maxRecordsPerFile = 40L)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(dirs.sorted.toSeq === langs.map(l => s"lang=$l").sorted.toSeq)

    // maxRecordsPerFile honored: no file holds more than 40 rows
    for (d <- dirs) {
      val files = new java.io.File(out, d).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty, d)
      for (f <- files)
        assert(spark.read.parquet(f.getPath).count() <= 40L, f.getName)
    }

    // lossless round-trip, and the partition column survives as a column
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    assert(back.columns.sorted === docs.columns.sorted)
    // partition pruning: a lang filter reads only that directory
    val one = back.filter(back("lang") === langs.head)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || one.count() ===
      docs.filter(docs("lang") === langs.head).count())
  }

  test("orc export: partitioned layout round-trips losslessly with pushdown") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = tmpDir("corpus-orc").toString
    CorpusExport.write(docs, out, format = "orc")
    val back = spark.read.orc(out)
    assert(back.count() === docs.count())
    assert(back.columns.sorted === docs.columns.sorted)
    val p = back.filter(back("doc_id") === 5L)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("pushedfilters") || p.contains("doc_id"))
  }

  test("jsonl shard export: fixed shard count, line-parseable, lossless") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = tmpDir("corpus-jsonl").toString
    CorpusExport.writeJsonlShards(docs, out, "doc_id", numShards = 4)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".json")).map(_.getPath)
    assert(files.length === 4)
    // every line of every shard is a standalone JSON object (the JSONL contract)
    for (f <- files) {
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f))
      lines.forEach { l =>
        assert(l.startsWith("{") && l.endsWith("}"), l.take(60))
      }
    }
    // lossless round-trip through the JSON reader
    val back = spark.read.json(out)
    assert(back.count() === docs.count())
    assert(back.columns.sorted === docs.columns.sorted)
  }

  test("range-sorted export: files cover disjoint doc_id ranges") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = tmpDir("corpus-range").toString
    CorpusExport.writeRangeSorted(docs, out, "doc_id", numFiles = 4)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1)
    // per-file [min, max] — the stats parquet row-group pruning keys on
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("doc_id"),
          org.apache.spark.sql.functions.max("doc_id")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "overlapping file ranges")
      case _ =>
    }
    // lossless and filter-prunable
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val p = back.filter(back("doc_id") === 5L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") || p.contains("pushedFilters"))
  }

  test("z-order interleave: column expression matches the reference bit-weave") {
    import spark.implicits._
    import graft.functions.ZOrder
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave16($"a", $"b")).as[Long].collect()
    assert(got.toSeq === pairs.map { case (a, b) => ZOrder.interleave16Ref(a, b) })
    // and the interleave is a bijection on the sampled grid
    val grid = for (a <- 0L to 63L; b <- 0L to 63L) yield ZOrder.interleave16Ref(a, b)
    assert(grid.distinct.size === grid.size)
  }

  test("z-ordered export: file envelopes are tight in BOTH dimensions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a 64×64 grid — a 1-D sort by x would give every file the full y range
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val out = tmpDir("corpus-zorder").toString
    CorpusExport.writeZOrdered(grid, out, "x", "y", numFiles = 16)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 4)
    val envelopes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // z-curve locality: most files' bounding boxes span ≤ half the range
    // in BOTH dims (a file straddling a major quadrant boundary may be
    // wide in one dim — that's inherent to the curve, not a layout bug).
    // A 1-D sort by x gives EVERY file the full y range (dy = 63).
    val tight = envelopes.count { case (dx, dy) => dx <= 32 && dy <= 32 }
    assert(tight * 4 >= envelopes.length * 3, envelopes.mkString(", "))
    val avgDy = envelopes.map(_._2).sum.toDouble / envelopes.length
    assert(avgDy <= 40.0, s"avg dy $avgDy — no better than a 1-D x sort")
    assert(spark.read.parquet(out).count() === 64L * 64L)
  }
}
