package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The production resume property: a STATEFUL query stopped mid-stream and
  * restarted against the SAME checkpoint continues from its persisted
  * state — totals keep accumulating, nothing re-emits, nothing resets.
  * (EventsStreamSpec covers file-source resume; this covers state-store
  * resume for flatMapGroupsWithState. Memory sinks refuse checkpoint
  * recovery, so the output goes through the recoverable file sink.)
  */
class CheckpointRestartSpec extends SparkTestBase {

  test("stateful query restarted from checkpoint continues accumulated state") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt-restart").toString
    val outDir = tmpDir("ckpt-restart-out").toString
    val input = MemoryStream[StatefulOps.UserEvent]
    val alerts = StatefulOps.spendAlerts(input.toDS(), threshold = 100.0)

    def start() = alerts.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def emitted() = spark.read.parquet(outDir)

    // run 1: user 1 reaches 60 — state persisted, no alert yet
    val q1 = start()
    try {
      input.addData(StatefulOps.UserEvent(1, "purchase", 60.0))
      q1.processAllAvailable()
      assert(emitted().count() === 0)
    } finally q1.stop()

    // run 2, same checkpoint: +70 must land on the RESTORED total of 60
    // (130 crosses 100 exactly once); a reset state would stay silent
    val q2 = start()
    try {
      input.addData(StatefulOps.UserEvent(1, "purchase", 70.0))
      q2.processAllAvailable()
      val out = emitted().collect()
      assert(out.length === 1)
      assert(out.head.getLong(0) === 1L)
      assert(out.head.getDouble(2) === 100.0)

      // and the restored state keeps moving: +80 → 210 crosses 200 once
      input.addData(StatefulOps.UserEvent(1, "purchase", 80.0))
      q2.processAllAvailable()
      val out2 = emitted().orderBy("threshold").collect()
      assert(out2.map(_.getDouble(2)).toSeq === Seq(100.0, 200.0))
    } finally q2.stop()
  }
}
