package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

class EventsStreamSpec extends SparkTestBase {

  private lazy val srcDir: String = {
    val d = tmpDir("events-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("streaming tumbling counts equal the batch computation (parity)") {
    val stream = EventsStream.fromDirectory(spark, srcDir)
    val q = EventsStream.tumblingCounts(stream).writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
      val batch = EventsStream.tumblingCounts(Tables.events(spark, "/root/testdata/sf0.001"))
      val g = got.agg(sum("cnt")).head().getLong(0)
      val b = batch.agg(sum("cnt")).head().getLong(0)
      assert(g === b)
      assert(got.count() === batch.count())
    } finally q.stop()
  }

  test("session windows produce bounded per-user sessions") {
    val stream = EventsStream.fromDirectory(spark, srcDir)
    val q = EventsStream.userSessions(stream).writeStream
      .format("memory").queryName("sessions_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_out")
      assert(got.count() > 0)
      // every session respects start <= end and has events
      assert(got.filter(col("session_start") > col("session_end")).count() === 0)
      assert(got.agg(min("n_events")).head().getLong(0) >= 1)
      // batch parity: total events across sessions = table rows
      val total = got.agg(sum("n_events")).head().getLong(0)
      assert(total === Tables.events(spark, "/root/testdata/sf0.001").count())
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes in-window duplicate event_ids") {
    // duplicate the file → every event_id appears twice
    val d = tmpDir("events-dup")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = EventsStream.fromDirectory(spark, d.toString)
    val q = EventsStream.dedupWithinWatermark(stream)
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").head().getLong(0)
      val distinct = Tables.events(spark, "/root/testdata/sf0.001").count()
      assert(n === distinct)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join (parity)") {
    val stream = EventsStream.fromDirectory(spark, srcDir)
    val q = EventsStream.signupClickJoin(stream).writeStream
      .format("memory").queryName("ssjoin_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val batch = EventsStream.signupClickJoin(
          Tables.events(spark, "/root/testdata/sf0.001")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.length > 0)
      assert(got === batch)
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join: inner parity + watermark-evicted null rows") {
    // Two time-ordered source files → two micro-batches, so the watermark
    // advances after batch 1 and the engine can emit outer null rows for
    // early signups. Trailing signups stay pending forever (no batch 3) —
    // that asymmetry is the semantics under test.
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // raw `ts` is TIMESTAMP_NTZ; compare in epoch-µs space (UTC session)
    val rawTsUs = unix_micros(col("ts").cast("timestamp"))
    val cutUs = 1706140800000000L // 2024-01-25T00:00:00Z (span is Jan 1-30)
    val d = tmpDir("events-loj")
    def writeSlice(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = tmpDir(s"slice-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = d.resolve(name)
      Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    writeSlice(raw.filter(rawTsUs < cutUs), "a.parquet", 1000000L)
    writeSlice(raw.filter(rawTsUs >= cutUs), "b.parquet", 2000000L)

    val stream = EventsStream.fromDirectory(spark, d.toString, maxFilesPerTrigger = 1)
    val q = EventsStream.signupClickLeftJoin(stream).writeStream
      .format("memory").queryName("loj_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("loj_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      val batch = EventsStream.signupClickLeftJoin(ev).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))

      // 1. inner results match the batch join exactly
      val gotInner = got.filter(_._2.isDefined).sorted
      assert(gotInner.toSeq === batch.filter(_._2.isDefined).sorted.toSeq)

      // 2. every streamed null row is a real batch null row
      val gotNulls = got.filter(_._2.isEmpty).map(_._1).toSet
      val batchNulls = batch.filter(_._2.isEmpty).map(_._1).toSet
      assert(gotNulls.subsetOf(batchNulls))

      // 3. nulls old enough that batch-1's watermark passed their window
      //    MUST have been evicted and emitted (1s slack on the boundary)
      val sliceA = spark.read.parquet(d.resolve("a.parquet").toString)
      def maxUs(tpe: String) = sliceA.filter(col("event_type") === tpe)
        .agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
      val wmUs = math.min(maxUs("signup"), maxUs("click")) - 2L * 3600 * 1000000
      val signupUs = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), expr("unix_micros(ts)"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val mustEmit = batchNulls.filter(id =>
        signupUs(id) + 3600000000L < wmUs - 1000000L)
      assert(mustEmit.subsetOf(gotNulls),
        s"${(mustEmit -- gotNulls).size} overdue null rows never emitted")
      assert(mustEmit.nonEmpty, "test needs at least one evictable null row")
    } finally q.stop()
  }

  test("chained stateful ops: in-stream dedup feeding windowed counts stays exactly-once") {
    // at-least-once ingest: every slice delivered TWICE, in time order, so
    // duplicates hit the dedup state (or arrive late and are watermark-
    // dropped — either way each event counts once); the downstream window
    // counts must equal the batch counts over distinct events.
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rawTsUs = unix_micros(col("ts").cast("timestamp"))
    val cutUs = 1706140800000000L // 2024-01-25T00:00:00Z
    val d = tmpDir("events-chain")
    def writeSlice(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = tmpDir(s"chain-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = d.resolve(name)
      Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    val a = raw.filter(rawTsUs < cutUs)
    val b = raw.filter(rawTsUs >= cutUs)
    writeSlice(a, "a1.parquet", 1000000L)
    writeSlice(a, "a2.parquet", 2000000L)
    writeSlice(b, "b1.parquet", 3000000L)
    writeSlice(b, "b2.parquet", 4000000L)

    val stream = EventsStream.fromDirectory(spark, d.toString, maxFilesPerTrigger = 1)
    val q = EventsStream.dedupedTumblingCounts(stream).writeStream
      .format("memory").queryName("chain_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("chain_out").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      val batch = ev
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap

      // every emitted window count equals the batch (duplicate-free) count
      assert(got.nonEmpty)
      for ((k, cnt) <- got) assert(batch(k) === cnt, s"window $k")
      // every window that closed before the post-slice-A watermark emitted
      val maxAUs = a.agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
      val wmMs = maxAUs / 1000 - 3600 * 1000
      val mustEmit = batch.keys.filter(_._1 + 6L * 3600 * 1000 < wmMs - 1000)
      val missing = mustEmit.filterNot(got.contains)
      assert(missing.isEmpty, s"${missing.size} closed windows never emitted")
      assert(mustEmit.nonEmpty)
    } finally q.stop()
  }

  test("idempotent foreachBatch sink: AvailableNow drains, replay is a no-op") {
    val target = tmpDir("sink-target").toString
    val ckpt = tmpDir("sink-ckpt").toString
    val stream = EventsStream.fromDirectory(spark, srcDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val q = EventsStream.runIdempotentSink(stream, target, ckpt)
    q.awaitTermination() // AvailableNow stops itself after the drain
    val n1 = spark.read.parquet(target).count()
    assert(n1 === Tables.events(spark, "/root/testdata/sf0.001").count())
    val mark = java.nio.file.Files.readString(
      java.nio.file.Paths.get(target, "_high_water_mark")).trim.toLong

    // crash-replay: re-deliver batch 0 with the same batchId — the
    // high-water mark must make it a no-op
    val replayed = spark.read.parquet(s"$target/batch_id=0")
    assert(!EventsStream.commitBatch(replayed, 0L, target),
      "replay of an acknowledged batchId must be skipped")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(target, "_high_water_mark")).trim.toLong === mark)
    assert(spark.read.parquet(target).count() === n1)
    // a NEW batchId commits and advances the mark
    assert(EventsStream.commitBatch(replayed.limit(1), mark + 1, target))
    assert(spark.read.parquet(target).count() === n1 + 1)
  }
}
