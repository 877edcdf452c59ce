package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming layer over the `events` table shape (SURVEY §2.10:
  * the reference is batch-only — separated-chain append is its one
  * incremental pattern; this extension layer adds watermarked windows,
  * session windows, and bounded-state dedup for the streaming north star).
  *
  * Batch/stream parity: each transform takes a DataFrame, so the SAME
  * function runs in a batch job (Tables.events) or on `readStream` — that
  * parity is what the streaming specs assert.
  */
object EventsStream {

  /** Raw parquet schema of the events table. The current driver files
    * store `ts` as timestamp[us] without UTC adjustment → TIMESTAMP_NTZ
    * (earlier generations used INT64 nanos; [[normalize]] still accepts
    * that shape for batch parity with Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet.
    * `maxFilesPerTrigger` > 0 throttles to that many files per
    * micro-batch — multiple batches let the watermark ADVANCE mid-stream,
    * which outer joins and state eviction need to observe. */
  def fromDirectory(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(rawSchema)
    val r2 = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger.toString) else r
    normalize(r2.parquet(dir))
  }

  /** Normalise `ts` to (TimestampType, ts_ns long) — the same contract and
    * branches as Tables.events, so a batch DataFrame and a readStream over
    * the same files produce identical downstream plans. */
  def normalize(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType => // legacy INT64-nanos files under nanosAsLong
      raw.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => // session TZ pinned UTC → exact relabeling
      raw.withColumn("ts", col("ts").cast(TimestampType))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    case _ =>
      raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
  }

  /** Tumbling-window counts/sums with a watermark: state is bounded by
    * (watermark / slide) windows per key. */
  def tumblingCounts(events: DataFrame, window_ : String = "6 hours",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding windows (1h window / 15m slide). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  /** Session windows per user with a 30-minute gap — the built-in
    * session_window stateful op (flatMapGroupsWithState only if semantics
    * outgrow it; SURVEY §7.4.6). */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Watermark-bounded exact dedup on event_id — state expires with the
    * watermark instead of growing forever. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each signup paired with the same user's
    * clicks in the hour after it. The time-range join condition plus
    * watermarks on BOTH sides bound the state store (rows are dropped once
    * no future match can arrive) — the streaming analogue of
    * [[graft.operators.RangeJoin]]. Works unchanged on batch DataFrames
    * (parity asserted in the spec). */
  def signupClickJoin(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("signup_id"))
      .withWatermark("s_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    signups.join(clicks,
      expr("s_user = c_user AND c_ts > s_ts AND c_ts <= s_ts + INTERVAL 1 HOUR"))
      .select(col("signup_id"), col("click_id"))
  }

  /** LEFT OUTER stream-stream interval join — every signup emits, with
    * null click columns when no click follows within the hour. The outer
    * side's null rows can only emit once the watermark passes the join
    * window (the engine must be sure no match is still coming), so this is
    * the canonical "conversion + abandonment in one query" shape: inner
    * results stream out immediately, non-conversions trail by the
    * watermark delay. Same bounded state as the inner join.
    */
  def signupClickLeftJoin(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("signup_id"))
      .withWatermark("s_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    signups.join(clicks,
      expr("s_user = c_user AND c_ts > s_ts AND c_ts <= s_ts + INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("signup_id"), col("click_id"))
  }

  /** CHAINED stateful operators in one streaming query: bounded-state
    * dedup feeding a watermarked tumbling aggregation (Spark 4 supports
    * multiple stateful operators when every stage is event-time bound).
    * The at-least-once ingest shape: upstream retries produce duplicate
    * event_ids, the dedup state absorbs them inside the watermark, and
    * the window counts stay exactly-once — without a second job or an
    * intermediate sink between the two stateful stages.
    */
  def dedupedTumblingCounts(events: DataFrame, window_ : String = "6 hours",
      watermark: String = "1 hour"): DataFrame =
    dedupWithinWatermark(events, watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  /** Idempotent foreachBatch sink: the production exactly-once pattern for
    * targets without transactional file-sink semantics (JDBC, key-value
    * upserts). Spark replays an unacknowledged micro-batch after a crash
    * with the SAME batchId, so the sink (a) skips batchIds at or below the
    * recorded high-water mark, and (b) writes batch data + the new mark
    * under the batchId before acknowledging. Here the "target" is a
    * parquet dir per batch + a mark file — the shape, not the store,
    * is the point; swap `commit` for a JDBC upsert in production.
    *
    * Returns the started query (Trigger.AvailableNow: drain everything
    * available, then stop — the backfill/catch-up trigger).
    */
  /** One micro-batch commit: write iff `batchId` is above the recorded
    * high-water mark, then advance the mark. Returns whether it wrote —
    * a replayed (already-acknowledged) batch is a no-op. */
  def commitBatch(batch: DataFrame, batchId: Long, targetDir: String): Boolean = {
    val mark = new java.io.File(targetDir, "_high_water_mark")
    val seen = if (mark.exists)
      java.nio.file.Files.readString(mark.toPath).trim.toLong else -1L
    if (batchId > seen) {
      batch.write.mode("overwrite") // overwrite: replayed half-written batch dirs heal
        .parquet(s"$targetDir/batch_id=$batchId")
      java.nio.file.Files.writeString(mark.toPath, batchId.toString)
      true
    } else false // duplicate replay of an acknowledged batch
  }

  def runIdempotentSink(df: DataFrame, targetDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        commitBatch(batch, batchId, targetDir); ()
      }
      .start()
  }
}
