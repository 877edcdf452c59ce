package graft.core

import org.apache.spark.sql.functions._

/** ScalarSub: the crossJoin(broadcast(oneRow)) replacement must keep the
  * VALUES identical while removing the join node from the plan.
  */
class ScalarSubSpec extends graft.SparkTestBase {

  private def facts = {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 60.0)).toDF("id", "v")
  }

  test("withScalars == crossJoin(broadcast) on a 1-row aggregate, join-free plan") {
    val one = facts.agg(avg(col("v")).as("mu"), count(lit(1)).as("n"))
    val viaScalar = ScalarSub.withScalars(facts, one)
      .select(col("id"), (col("v") / col("mu")).as("r"), col("n"))
    val viaCross = facts.crossJoin(broadcast(one))
      .select(col("id"), (col("v") / col("mu")).as("r"), col("n"))
    assert(viaScalar.orderBy("id").collect().toSeq ===
      viaCross.orderBy("id").collect().toSeq)
    val p = viaScalar.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "scalar route must plan no join:\n" + p.take(1500))
    assert(p.contains("Subquery") || p.contains("scalar-subquery"), p.take(1500))
  }

  test("struct wrapping keeps MANY field reads ONE subquery (dedup via reuse)") {
    val one = facts.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      sum(col("v")).as("s"))
    val df = ScalarSub.withScalars(facts, one)
    // all three fields come from the same struct subquery: the analyzed
    // plan carries three ScalarSubquery expressions with ONE distinct
    // subquery plan among them (ReuseSubquery collapses them at exec)
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val subPlans = df.queryExecution.analyzed.flatMap(node =>
      node.expressions.flatMap(_.collect {
        case s: ScalarSubquery => s.plan.canonicalized
      }))
    assert(subPlans.nonEmpty)
    assert(subPlans.distinct.size === 1,
      s"expected one shared subquery plan, got ${subPlans.distinct.size}")
    assert(df.select(col("hi") - col("lo")).head().getDouble(0) === 50.0)
  }
}
