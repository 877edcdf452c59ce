package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class TtlStateSpec extends SparkTestBase {

  test("transformWithState keeps running per-user totals across micro-batches") {
    val session = spark
    import session.implicits._
    // transformWithState requires the RocksDB state store provider. A
    // TTL'd processing-time operator constructs a batch on EVERY trigger
    // (state eviction can fire with no new data), so neither
    // Trigger.AvailableNow (never drains) nor processAllAvailable
    // (noNewData never latches) can be used to drive it — poll the sink
    // for the expected row count instead. Few state partitions: one
    // RocksDB instance per partition per batch is the dominant test cost.
    val prevParts = session.conf.get("spark.sql.shuffle.partitions")
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    session.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[TtlState.Spend]
    val q = TtlState.runningSpend(input.toDS()).writeStream
      .format("memory").queryName("ttl_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (session.table("ttl_out").count() < n && System.nanoTime < deadline) {
        q.exception.foreach(throw _)
        Thread.sleep(200)
      }
      assert(session.table("ttl_out").count() >= n, s"sink never reached $n rows")
    }
    try {
      input.addData(TtlState.Spend(1L, 10.0), TtlState.Spend(1L, 5.0),
        TtlState.Spend(2L, 7.0))
      awaitRows(3)
      // second batch continues from stored state
      input.addData(TtlState.Spend(1L, 1.0))
      awaitRows(4)

      val rows = session.table("ttl_out").as[TtlState.Running].collect()
        .sortBy(r => (r.user_id, r.n))
      // user 1 saw three events with a running total; user 2 one event
      val u1 = rows.filter(_.user_id == 1L)
      assert(u1.map(_.n).toSeq === Seq(1L, 2L, 3L))
      assert(math.abs(u1.last.total - 16.0) < 1e-9)
      val u2 = rows.filter(_.user_id == 2L)
      assert(u2.map(_.total).toSeq === Seq(7.0))
    } finally {
      q.stop()
      session.conf.unset("spark.sql.streaming.stateStore.providerClass")
      session.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
