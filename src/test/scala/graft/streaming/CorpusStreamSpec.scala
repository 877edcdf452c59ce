package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

class CorpusStreamSpec extends SparkTestBase {

  private lazy val srcDir: String = {
    val d = tmpDir("corpus-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  private lazy val batchDocs =
    CorpusStream.withArrival(Tables.documents(spark, "/root/testdata/sf0.001"))

  test("row-local simhashCol matches a driver-side reference fold") {
    import spark.implicits._
    val rows = batchDocs.select($"doc_id", $"text",
        graft.text.TextOps.simhashCol(graft.text.TextOps.tokens($"text")).as("sh"))
      .limit(50).collect()
    // reference: hash each distinct token with Spark's own xxhash64 (seed
    // semantics matter — reuse the engine, fold on the driver)
    val toks = rows.flatMap(_.getString(1).split(" ").filter(_.nonEmpty)).distinct
    val hashed = toks.toSeq.toDF("tok")
      .select($"tok", xxhash64($"tok").as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val uniq = r.getString(1).split(" ").filter(_.nonEmpty).distinct
      val want = (0 until 16).map { j =>
        val s = uniq.map(t => ((hashed(t) >> j) & 1L) * 2 - 1).sum
        if (s > 0) 1L << j else 0L
      }.sum
      assert(r.getLong(2) === want, s"doc ${r.getLong(0)}")
    }
  }

  test("streaming near-dup dedup equals batch dedup (parity, wide watermark)") {
    val q = CorpusStream.nearDupDedup(CorpusStream.fromDirectory(spark, srcDir))
      .writeStream.format("memory").queryName("corpus_dedup").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("corpus_dedup").count()
      // batch equivalent: one doc per distinct simhash
      val want = CorpusStream.nearDupDedup0(batchDocs).count()
      assert(got === want)
      assert(got > 0 && got < batchDocs.count()) // it actually dropped dupes
    } finally q.stop()
  }

  test("streaming quality gate equals batch gqRules doc for doc (stateless parity)") {
    import spark.implicits._
    // batch side of the SAME expressions vs the explode+groupBy gqRules
    val viaGate = CorpusStream
      .qualityGate(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(4), r.getBoolean(6))).toMap
    val viaRules = graft.llm.QualityQueries
      .gqRules(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_words", $"mean_wl", $"n_stop", $"pass")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(viaGate === viaRules)

    // and the stream runs the identical projection with NO state store
    val q = CorpusStream.qualityGate(CorpusStream.fromDirectory(spark, srcDir))
      .writeStream.format("memory").queryName("corpus_gate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("corpus_gate")
        .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
      assert(streamed === viaGate.map { case (k, v) => k -> v._4 })
      assert(q.lastProgress.stateOperators.isEmpty) // genuinely stateless
    } finally q.stop()
  }
}
