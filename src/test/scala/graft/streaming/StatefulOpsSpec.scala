package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulOpsSpec extends SparkTestBase {

  test("flatMapGroupsWithState carries running totals across micro-batches") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulOps.UserEvent]
    val alerts = StatefulOps.spendAlerts(input.toDS(), threshold = 100.0)
    val q = alerts.writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      // batch 1: user 1 spends 60 — no alert yet
      input.addData(StatefulOps.UserEvent(1, "purchase", 60.0))
      q.processAllAvailable()
      assert(spark.table("alerts").count() === 0)
      // batch 2: +70 → total 130 crosses 100 once
      input.addData(StatefulOps.UserEvent(1, "purchase", 70.0))
      q.processAllAvailable()
      val a1 = spark.table("alerts").collect()
      assert(a1.length === 1)
      assert(a1.head.getDouble(2) === 100.0)
      // batch 3: +180 → total 310 crosses 200 and 300
      input.addData(StatefulOps.UserEvent(1, "purchase", 180.0))
      input.addData(StatefulOps.UserEvent(2, "purchase", 10.0)) // independent state
      q.processAllAvailable()
      val a2 = spark.table("alerts").orderBy("threshold").collect()
      assert(a2.map(_.getDouble(2)).toSeq === Seq(100.0, 200.0, 300.0))
      assert(a2.forall(_.getLong(0) === 1L)) // user 2 never alerted
    } finally q.stop()
  }

  test("streaming funnel matches the batch fn1 query (event-time-ordered feed)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = graft.core.Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_type"), col("us"))
      .as[StatefulOps.FunnelEvent]
      .collect().sortBy(_.us)
    val input = MemoryStream[StatefulOps.FunnelEvent]
    val q = StatefulOps.funnelProgress(input.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      // two event-time-ordered micro-batches; state carries across them
      val (b1, b2) = all.splitAt(all.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      // latest update per user (by the carried update counter) == the
      // batch query's verdict; intermediate advances are also present
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("upd_seq").desc)
      val streamed = spark.table("funnel")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "funnel_stage", "v_us", "c_us", "p_us")
      val batch = graft.analytics.AnalyticsQueries.fn1(spark, dir)
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("sliding windows overlap correctly (1h window / 15m slide)") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventsStream.slidingCounts(
      graft.core.Tables.events(spark, dir))
    // each event lands in 4 overlapping windows → total window-rows count
    // per type is 4x the tumbling-15m count bound; sanity: sum of counts
    // equals 4 * number of events (minus edge windows? no: every event is
    // in exactly 4 hour-long windows at 15m slide)
    val total = batch.agg(sum("cnt")).head().getLong(0)
    val n = graft.core.Tables.events(spark, dir).count()
    assert(total === 4 * n)
  }

  test("streaming EWMA matches the batch ewma1 fold exactly (day-ordered feed)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the same daily series ewma1 folds over, in day order
    val daily = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[StatefulOps.DayCount]
      .collect().sortBy(d => (d.day, d.event_type))
    val input = MemoryStream[StatefulOps.DayCount]
    val q = StatefulOps.ewmaDaily(input.toDS())
      .writeStream.format("memory").queryName("ewma").outputMode("append").start()
    try {
      // three day-ordered micro-batches: the one-double state carries across
      val third = daily.length / 3
      input.addData(daily.take(third).toIndexedSeq); q.processAllAvailable()
      input.addData(daily.slice(third, 2 * third).toIndexedSeq); q.processAllAvailable()
      input.addData(daily.drop(2 * third).toIndexedSeq); q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("n_days").desc)
      val streamed = spark.table("ewma")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_type"), col("n_days"),
          round(col("ewma"), 6).as("ewma"))
      val batch = graft.analytics.AnalyticsQueries.ewma1(spark, dir)
        .select(col("event_type"), col("n_days"), col("ewma"))
      // EXACT equality: the stream recurrence and the batch fold use the
      // same literals in the same order, so the doubles are bit-identical
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      // every day emitted exactly one update
      assert(spark.table("ewma").count() === daily.length.toLong)
    } finally q.stop()
  }
}
