package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.rng.Seed
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

class AsOfJoinExecSpec extends SparkTestBase {

  private def mkDf(rows: Seq[(Long, Long, Long)], payload: Boolean): DataFrame = {
    import spark.implicits._
    if (payload) rows.toDF("user_id", "us", "pay_id")
    else rows.toDF("user_id", "us", "event_id")
  }

  private def declarative(l: DataFrame, r: DataFrame, fwd: Boolean): Set[(Long, Option[Long])] = {
    import spark.implicits._
    val j = if (fwd) graft.operators.AsOfJoin.forward(l, r, "user_id", "us", Seq("pay_id"))
    else graft.operators.AsOfJoin.backward(l, r, "user_id", "us", Seq("pay_id"))
    j.select($"event_id", $"pay_id").as[(Long, Option[Long])].collect().toSet
  }

  private def native(l: DataFrame, r: DataFrame, fwd: Boolean): Set[(Long, Option[Long])] = {
    import spark.implicits._
    val j = if (fwd) NativeAsOf.forward(l, r, "user_id", "us", Seq("pay_id"))
    else NativeAsOf.backward(l, r, "user_id", "us", Seq("pay_id"))
    j.select($"event_id", $"pay_id").as[(Long, Option[Long])].collect().toSet
  }

  test("native exec ≡ declarative union+window on randomized inputs (both directions)") {
    // ts drawn from a small range so <=/>=/equality boundaries all occur;
    // DISTINCT (key, ts) per side — at ties both implementations pick an
    // arbitrary winner, which is the documented as-of contract
    val genSide = Gen.listOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 9L)))
      .map(_.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    val prop = forAll(genSide, genSide) { (ls, rs) =>
      val l = mkDf(ls, payload = false)
      val r = mkDf(rs, payload = true)
      declarative(l, r, fwd = false) == native(l, r, fwd = false) &&
        declarative(l, r, fwd = true) == native(l, r, fwd = true)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(12).withInitialSeed(Seed(42L)))
    assert(res.passed, res.status.toString)
  }

  test("empty right side -> all-null payload; empty left -> empty result") {
    val l = mkDf(Seq((1L, 5L, 100L)), payload = false)
    val r = mkDf(Seq.empty, payload = true)
    assert(native(l, r, fwd = false) === Set((100L, None)))
    assert(native(r.toDF("user_id", "us", "event_id"), l.toDF("user_id", "us", "pay_id"),
      fwd = false) === Set.empty)
  }

  test("plan shape: exchanges + sorts inserted by EnsureRequirements, no window") {
    import spark.implicits._
    val l = mkDf(Seq((1L, 5L, 100L), (2L, 6L, 101L)), payload = false)
    val r = mkDf(Seq((1L, 4L, 200L)), payload = true)
    val p = NativeAsOf.backward(l, r, "user_id", "us", Seq("pay_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // nodeName renders without the Exec suffix
    assert(!p.toLowerCase.contains("window"), p)
    assert("hashpartitioning\\(user_id".r.findAllIn(p.toLowerCase).size >= 2, p)
    assert(p.toLowerCase.contains("sort"), p)
  }

  test("self-join lineage (same memoized table on both sides) is re-aliased safely") {
    import spark.implicits._
    val base = Seq((1L, 1L, 10L), (1L, 5L, 11L), (1L, 3L, 12L))
      .toDF("user_id", "us", "event_id")
    val l = base
    val r = base.select($"user_id", $"us", $"event_id".as("pay_id"))
    val got = NativeAsOf.backward(l, r, "user_id", "us", Seq("pay_id"))
      .select($"event_id", $"pay_id").as[(Long, Long)].collect().toSet
    // each row matches ITSELF (r.us <= l.us, latest) under shared lineage
    assert(got === Set((10L, 10L), (11L, 11L), (12L, 12L)))
  }
}
