package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Bucketed table layout: pay a dataset's join/aggregation shuffle ONCE at
  * write time instead of on every query.
  *
  * `bucketBy(n, key)` hash-partitions rows into a fixed number of buckets
  * recorded in the catalog; any later equi-join or groupBy on `key`
  * between tables with the SAME bucket count satisfies its
  * `HashClusteredDistribution` straight off the scan — the planner drops
  * the Exchange on both sides (see BucketedJoinSpec's plan assertion). At
  * 100 TB that converts the nightly "join facts to the doc-stats table"
  * from a full two-sided shuffle into a map-side zip of bucket files.
  *
  * Written as an EXTERNAL table (explicit `path`): files live where the
  * caller says, the catalog entry carries only schema + bucket spec. The
  * `repartition(n, key)` before the write makes each bucket single-writer
  * — one file per bucket per write, not one per task×bucket — which also
  * lets the sorted-scan optimization kick in (Spark trusts `sortBy` order
  * only when a bucket holds one file).
  */
object BucketedLayout {

  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, col(key))
      .write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)
}
