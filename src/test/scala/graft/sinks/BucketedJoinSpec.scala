package graft.sinks

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The bucketed-layout contract: equal-bucket-count tables joined or
  * aggregated on the bucket key plan with NO Exchange — the write-once
  * shuffle actually pays for itself. */
class BucketedJoinSpec extends SparkTestBase {

  private def withNoBroadcast[A](body: => A): A = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, old)
  }

  test("bucketed join on the bucket key plans without any Exchange") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val left = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val right = docs.select(col("doc_id"), col("source"))
    BucketedLayout.writeBucketed(left, "bj_docs",
      tmpDir("bj-docs").toString, "doc_id", 8)
    BucketedLayout.writeBucketed(right, "bj_stats",
      tmpDir("bj-stats").toString, "doc_id", 8)
    try withNoBroadcast {
      val j = spark.table("bj_docs").join(spark.table("bj_stats"), "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // one file per bucket (single-writer repartition) → 8 files each
      assert(spark.table("bj_docs").inputFiles.length === 8)
      // and the answer is the unbucketed answer
      assert(j.count() === left.join(right, "doc_id").count())

      // groupBy on the bucket key also satisfies its distribution off the scan
      val g = spark.table("bj_docs").groupBy("doc_id").agg(sum("n_chars"))
      val gplan = g.queryExecution.executedPlan.toString
      assert(!gplan.contains("Exchange"), s"bucketed agg shuffled:\n$gplan")
      assert(g.count() === left.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_docs")
      spark.sql("DROP TABLE IF EXISTS bj_stats")
    }
  }
}
