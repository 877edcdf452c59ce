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
}
