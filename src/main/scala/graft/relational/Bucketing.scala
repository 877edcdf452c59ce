package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY "Partitioning & shuffle": bucketing
  * for repeated joins on the same key).
  *
  * At 100 TB the orders⋈lineitem join dominates; bucketing both tables by
  * the join key at WRITE time removes the per-query shuffle entirely —
  * Spark reads bucket i of each side into the same task. The utility below
  * materializes bucketed tables once and exposes the shuffle-free join;
  * BucketingSpec asserts the plan has no Exchange on the join path.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (idempotent). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      // a crash can orphan the location without the metastore entry —
      // clear it or CTAS fails with LOCATION_ALREADY_EXISTS
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(wh, table)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteQuietly(loc)
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    }
  }

  /** Table names are scoped to the source dir — idempotency must not serve
    * one scale factor's buckets for another's request. */
  def tableSuffix(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode).takeRight(8)

  /** Co-located orders⋈lineitem: both sides bucketed on the order key →
    * the join plans without a shuffle exchange. */
  def colocatedOrdersLineitem(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    val sfx = tableSuffix(dir)
    val (ot, lt) = (s"orders_b_$sfx", s"lineitem_b_$sfx")
    writeBucketed(graft.core.Tables.orders(spark, dir), ot, "o_orderkey", buckets)
    writeBucketed(graft.core.Tables.lineitem(spark, dir), lt, "l_orderkey", buckets)
    spark.table(lt).join(spark.table(ot),
      spark.table(lt)("l_orderkey") === spark.table(ot)("o_orderkey"))
  }
}
