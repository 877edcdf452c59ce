package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst pushes filters and prunes
  * columns into the scan (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). Nothing is cached here — callers own persistence policy.
  */
object Tables {

  // Memoized source relations per (session, path): `spark.read.parquet`
  // re-lists files and re-reads footers on every call — a metastore caches
  // that metadata in any real deployment. DataFrames are immutable plan
  // fragments; sharing them never shares execution state.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // lazily purge entries of stopped sessions (no invalidation needed for
    // live ones: the test tables are immutable by contract, TESTDATA.md)
    cache.keySet.removeIf { case (s, _) => s.sparkContext.isStopped }
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })
  }

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events` with its timestamp column normalised to a stable contract:
    * `ts` = TimestampType (µs precision, UTC instant), `ts_ns` = epoch
    * nanoseconds as a long. The physical file has shipped in three
    * encodings across driver regenerations, so we branch on the scanned
    * type instead of assuming one:
    *
    *  - INT64 TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong`
    *    it arrives as a long. Exact nanos become `ts_ns`; `ts` is the
    *    µs-truncated timestamp (integer `div` — a double division would
    *    lose precision above 2^53 ns).
    *  - timestamp[us] without UTC adjustment → TIMESTAMP_NTZ. The session
    *    time zone is pinned UTC ([[GraftSession]]), so `cast(ts as
    *    timestamp)` is an exact wall-clock→instant relabeling and
    *    `ts_ns = unix_micros(ts) * 1000`.
    *  - timestamp[us] UTC-adjusted → TimestampType, same derivation.
    *
    * DuckDB's `epoch_us(ts)` truncates nanos the same way, so µs-level
    * comparisons against the oracle are exact in every case.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
}
