package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionTimersSpec extends SparkTestBase {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("event-time timers emit each closed session exactly once") {
    val session = spark
    import session.implicits._
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    session.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[SessionTimers.Click]
    val withWm = input.toDS().withWatermark("ts", "10 seconds")
      .as[SessionTimers.Click]
    val q = SessionTimers.closedSessions(withWm,
        gap = java.time.Duration.ofSeconds(60))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .start()
    try {
      val base = 1700000000000L
      // user 1: two events 30 s apart (one session); user 2: one event
      input.addData(
        SessionTimers.Click(1L, ts(base), 2.0),
        SessionTimers.Click(1L, ts(base + 30000), 3.0),
        SessionTimers.Click(2L, ts(base + 5000), 7.0))
      q.processAllAvailable()
      // nothing closes until the watermark passes end + gap
      assert(session.table("sess_out").count() == 0)
      // an event far in the future drives the watermark past both sessions
      input.addData(SessionTimers.Click(3L, ts(base + 600000), 1.0))
      q.processAllAvailable()
      // watermark advance is applied at the NEXT batch; nudge once more
      input.addData(SessionTimers.Click(3L, ts(base + 610000), 1.0))
      q.processAllAvailable()

      val out = session.table("sess_out").as[SessionTimers.Session]
        .collect().sortBy(_.user_id)
      assert(out.map(_.user_id).toSeq == Seq(1L, 2L))
      val s1 = out(0)
      assert(s1.n == 2 && math.abs(s1.total - 5.0) < 1e-9)
      assert(s1.start_ms == base && s1.end_ms == base + 30000)
      val s2 = out(1)
      assert(s2.n == 1 && math.abs(s2.total - 7.0) < 1e-9)
      // user 3's session is still open — not emitted
      assert(!out.exists(_.user_id == 3L))
    } finally {
      q.stop()
      session.conf.unset("spark.sql.streaming.stateStore.providerClass")
      session.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
