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
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    }
  }

  /** Co-located orders⋈lineitem: both sides bucketed on the order key →
    * the join plans without a shuffle exchange. */
  def colocatedOrdersLineitem(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    writeBucketed(graft.core.Tables.orders(spark, dir), "orders_b", "o_orderkey", buckets)
    writeBucketed(graft.core.Tables.lineitem(spark, dir), "lineitem_b", "l_orderkey", buckets)
    spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
  }
}
