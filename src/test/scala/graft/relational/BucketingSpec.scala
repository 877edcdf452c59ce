package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  test("bucketed orders/lineitem join plans without a shuffle exchange") {
    val sfx = Bucketing.tableSuffix("/root/testdata/sf0.001")
    spark.sql(s"DROP TABLE IF EXISTS orders_b_$sfx")
    spark.sql(s"DROP TABLE IF EXISTS lineitem_b_$sfx")
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.colocatedOrdersLineitem(spark, "/root/testdata/sf0.001")
      val agg = j.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      // the join keys must never be shuffled (bucketed co-location); the
      // post-join group-by exchange on o_orderpriority is expected
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("Bucketed: true"))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"expected shuffle-free join inputs, got:\n$plan")
      // correctness: same result as the plain join
      val expect = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .join(graft.core.Tables.orders(spark, "/root/testdata/sf0.001"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(agg.orderBy("o_orderpriority").collect().toSeq ===
        expect.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS orders_b_$sfx")
      spark.sql(s"DROP TABLE IF EXISTS lineitem_b_$sfx")
    }
  }
}
