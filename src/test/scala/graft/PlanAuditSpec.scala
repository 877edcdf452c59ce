package graft

/** Plan-shape audit: the 100 TB posture claims (broadcast dims, pushed
  * filters, no cartesian products) asserted against the actual physical
  * plans at sf0.001.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q5: every dimension joins as broadcast, no cartesian") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q6: filters reach the parquet scan (pushdown)") {
    val p = formatted("q6_forecast_revenue")
    assert(p.contains("PushedFilters"))
    // shipdate range must be in the pushed filter set, not a post-scan filter only
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("LessThan(l_shipdate"))
  }

  test("q1: column pruning — scan reads only needed lineitem columns") {
    val p = formatted("q1_pricing_summary")
    val scanLine = p.split("\n").find(_.contains("ReadSchema")).get
    assert(!scanLine.contains("l_orderkey"), "q1 must not read join keys")
    assert(scanLine.contains("l_returnflag") && scanLine.contains("l_quantity"))
  }

  test("d2 minhash: candidate generation is an equijoin on band keys") {
    val p = plan("d2_minhash_lsh")
    assert(!p.contains("CartesianProduct"))
  }

  test("s1 ANN: query vector is broadcast, not shuffled") {
    val p = plan("s1_ann_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("whole-stage codegen is active on the hot aggregation path") {
    val p = plan("q1_pricing_summary") // post-collect: AQE final plan
    assert(p.contains("*(")) // WholeStageCodegen stage markers
  }

  test("q18: the having-aggregate side is broadcast, orders is not built") {
    val p = plan("q18_large_orders")
    assert(p.contains("BroadcastExchange"))
    // the broadcast input must be the aggregated lineitem (sum_qty), not a
    // bare orders scan
    val bcIdx = p.indexOf("BroadcastExchange")
    assert(p.indexOf("HashAggregate", bcIdx) >= 0)
  }

  test("rj1 range join: bucketed equijoin, never a nested-loop join") {
    val p = plan("rj1_range_join_count")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("q17: single shuffle of the brand subset — no full-fact aggregation") {
    val p = formatted("q17_small_qty_revenue")
    // the part filter must be pushed into the part scan feeding the broadcast
    assert(p.contains("EqualTo(p_brand,Brand#1)"))
  }

  test("no query moves all rows to a single-partition window") {
    // spot-check the rank-based queries: their plans must not contain a
    // Window with an empty partition spec (the 100 TB red flag)
    for (q <- Seq("a12_equal_count_bins", "w3_earliest_split",
        "w4_burnin_thinning", "d2_minhash_lsh", "t4_fingerprint")) {
      val p = plan(q)
      assert(!p.contains("windowspecdefinition()"), q)
      assert(!"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined, q)
    }
  }
}
