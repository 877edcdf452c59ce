package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.rng.Seed
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

class BandJoinExecSpec extends SparkTestBase {

  private val Band = 3L

  private def mkDf(rows: Seq[(Long, Long, Long)], payload: Boolean): DataFrame = {
    import spark.implicits._
    if (payload) rows.toDF("user_id", "us", "pay_id")
    else rows.toDF("user_id", "us", "event_id")
  }

  /** Reference semantics: plain join + inequality filter (planned as a
    * nested-loop on these tiny inputs — fine for a spec, fatal at scale,
    * which is the exec's reason to exist). */
  private def reference(l: DataFrame, r: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.us") > col("l.us") && col("r.us") <= col("l.us") + Band)
      .select($"l.event_id", $"r.pay_id").as[(Long, Long)].collect().toSet
  }

  private def native(l: DataFrame, r: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    NativeBandJoin.after(l, r, "user_id", "us", Seq("pay_id"), Band)
      .select($"event_id", $"pay_id").as[(Long, Long)].collect().toSet
  }

  test("native exec ≡ join+filter reference on randomized inputs") {
    // small key/ts ranges force dense bands, empty bands, boundary hits
    // (r.us == l.us excluded, r.us == l.us + band included) and hot keys
    val genSide = Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 11L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    val prop = forAll(genSide, genSide) { (ls, rs) =>
      val l = mkDf(ls, payload = false)
      val r = mkDf(rs, payload = true)
      reference(l, r) == native(l, r)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(12).withInitialSeed(Seed(7L)))
    assert(res.passed, res.status.toString)
  }

  test("band boundaries: (t, t+band] half-open semantics, duplicates kept") {
    // left at t=5: right at 5 (excluded), 6,7,8 (included, dup ts kept), 9 (excluded)
    val l = mkDf(Seq((1L, 5L, 100L)), payload = false)
    val r = mkDf(Seq((1L, 5L, 200L), (1L, 6L, 201L), (1L, 8L, 202L),
      (1L, 8L, 203L), (1L, 9L, 204L), (2L, 6L, 205L)), payload = true)
    assert(native(l, r) === Set((100L, 201L), (100L, 202L), (100L, 203L)))
  }

  test("rows consumed once serve overlapping bands of successive left rows") {
    // two left rows 1 apart share part of the band: the right row at 7 must
    // match BOTH (the eviction rule only drops rows at or below the new lt)
    val l = mkDf(Seq((1L, 4L, 100L), (1L, 5L, 101L)), payload = false)
    val r = mkDf(Seq((1L, 7L, 200L)), payload = true)
    assert(native(l, r) === Set((100L, 200L), (101L, 200L)))
  }

  test("empty band drops the left row (inner semantics); empty sides -> empty") {
    val l = mkDf(Seq((1L, 5L, 100L)), payload = false)
    val rFar = mkDf(Seq((1L, 50L, 200L)), payload = true)
    assert(native(l, rFar) === Set.empty)
    assert(native(l, mkDf(Seq.empty, payload = true)) === Set.empty)
    assert(native(mkDf(Seq.empty, payload = false), rFar) === Set.empty)
  }

  test("plan shape: BandJoin exec with exchanges/sorts, no nested loop") {
    val l = mkDf(Seq((1L, 5L, 100L), (2L, 6L, 101L)), payload = false)
    val r = mkDf(Seq((1L, 6L, 200L)), payload = true)
    val p = NativeBandJoin.after(l, r, "user_id", "us", Seq("pay_id"), Band)
      .queryExecution.executedPlan.toString
    assert(p.contains("BandJoin "), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert("hashpartitioning\\(user_id".r.findAllIn(p.toLowerCase).size >= 2, p)
    assert(p.toLowerCase.contains("sort"), p)
  }

  test("self-join lineage (same frame on both sides) is re-aliased safely") {
    import spark.implicits._
    val base = Seq((1L, 1L, 10L), (1L, 3L, 11L), (1L, 4L, 12L))
      .toDF("user_id", "us", "event_id")
    val r = base.select($"user_id", $"us", $"event_id".as("pay_id"))
    val got = NativeBandJoin.after(base, r, "user_id", "us", Seq("pay_id"), Band)
      .select($"event_id", $"pay_id").as[(Long, Long)].collect().toSet
    // band (t, t+3]: 1 -> {3, 4}; 3 -> {4}; 4 -> {}
    assert(got === Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }
}
