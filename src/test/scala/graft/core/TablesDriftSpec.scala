package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The driver regenerates /root/testdata between rounds and has already
  * re-typed columns once (events.ts: INT64 nanos → timestamp[us] NTZ).
  * These specs pin the contract: tolerable drift (width/encoding changes
  * within a class) loads and normalises; intolerable drift (cross-class
  * re-type, dropped column) fails AT THE LOAD with table+column named.
  */
class TablesDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def writeTable(rows: org.apache.spark.sql.DataFrame, name: String): String = {
    val d = tmpDir("drift")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$d/$name.parquet")
    d.toString
  }

  test("widened integral column (int32 doc_id -> int64) loads fine") {
    val dir = writeTable(
      Seq((1L, "a", "en", "web", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars")
        .select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("int")), // n_chars narrowed: still integral
      "documents")
    assert(Tables.documents(spark, dir).count() === 1)
  }

  test("additive drift (extra column) loads fine") {
    val dir = writeTable(
      Seq((1L, "a", "en", "web", 1L, 0.9)).toDF(
        "doc_id", "text", "lang", "source", "n_chars", "quality_v2"),
      "documents")
    val df = Tables.documents(spark, dir)
    assert(df.columns.contains("quality_v2"))
  }

  test("cross-class re-type fails at load with table and column named") {
    val dir = writeTable(
      Seq(("1", "a", "en", "web", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"),
      "documents")
    val e = intercept[IllegalStateException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("documents"))
    assert(e.getMessage.contains("doc_id"))
  }

  test("dropped column fails at load with MISSING named") {
    val dir = writeTable(
      Seq((1L, "a", "en", 1L)).toDF("doc_id", "text", "lang", "n_chars"),
      "documents")
    val e = intercept[IllegalStateException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("source"))
    assert(e.getMessage.contains("MISSING"))
  }

  test("events ts arrives as (TimestampType, ts_ns long) for every physical encoding") {
    // NTZ encoding — what the current driver files use
    val ntz = writeTable(
      Seq((1L, "2024-01-05 06:07:08.123456", 7L, "click", 1.5, "{}"))
        .toDF("event_id", "s", "user_id", "event_type", "value", "props")
        .select(col("event_id"), to_timestamp_ntz(col("s")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
      "events")
    val e1 = Tables.events(spark, ntz)
    assert(e1.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(e1.schema("ts_ns").dataType === org.apache.spark.sql.types.LongType)
    val r1 = e1.select(col("ts_ns"), unix_micros(col("ts"))).head()
    assert(r1.getLong(0) === 1704434828123456L * 1000L)
    assert(r1.getLong(1) === 1704434828123456L)

    // TimestampType (UTC-adjusted) encoding
    val tz = writeTable(
      Seq((1L, "2024-01-05 06:07:08.123456", 7L, "click", 1.5, "{}"))
        .toDF("event_id", "s", "user_id", "event_type", "value", "props")
        .select(col("event_id"), to_timestamp(col("s")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
      "events")
    val e2 = Tables.events(spark, tz)
    assert(e2.select("ts_ns").head().getLong(0) === 1704434828123456L * 1000L)
  }
}
