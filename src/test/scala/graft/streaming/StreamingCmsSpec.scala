package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import graft.functions.Aggregators
import graft.functions.Aggregators.CountMin
import org.apache.spark.sql.functions._

/** Incremental sketch maintenance over a stream: a count-min sketch merged
  * micro-batch by micro-batch in foreachBatch must equal the sketch built
  * in one batch pass over the same rows — the mergeability law exercised in
  * the setting it exists for (a sketch kept fresh against an unbounded
  * stream, the standard approximate-monitoring shape). Batch order is
  * whatever the file source delivers; vector-add merge is commutative, so
  * the equality is exact, not approximate.
  */
class StreamingCmsSpec extends SparkTestBase {

  private val D = 4
  private val W = 256

  test("foreachBatch-maintained CMS equals the one-pass batch sketch") {
    import spark.implicits._
    // split sf0.001 events into several files so the stream runs >1 batch
    val d = tmpDir("cms-stream")
    Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id")
      .repartition(4).write.mode("overwrite").parquet(d.toString)

    val cm = udaf(new CountMin(D, W))
    val running = new Array[Long](D * W)
    var batches = 0
    val stream = spark.readStream
      .schema("event_id LONG, user_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString)
    val q = stream.writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
      val rows = df.agg(cm(col("user_id"))).collect()
      if (rows.nonEmpty && !rows(0).isNullAt(0)) {
        val part = rows(0).getSeq[Long](0)
        var i = 0
        while (i < running.length) { running(i) += part(i); i += 1 }
        batches += 1
      }
      (): Unit
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    val whole = spark.read.parquet(d.toString)
      .agg(cm(col("user_id"))).head().getSeq[Long](0)
    assert(running.toSeq === whole.toSeq)

    // and the merged sketch still answers point queries within its contract
    val exact = spark.read.parquet(d.toString)
      .groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (u, c) =>
      val est = (0 until D).map(r => running(r * W + Aggregators.CountMin.index(r, u, W))).min
      assert(est >= c, s"user $u")
    }
  }
}
