package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  test("backward as-of: latest right row at or before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 30L, "e3"), (2L, 15L, "e4"))
      .toDF("k", "ts", "name")
    val right = Seq(
      (1L, 5L, "q1"), (1L, 20L, "q2"), (1L, 30L, "q3"), (2L, 99L, "q4"))
      .toDF("k", "ts", "quote")
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("quote"))
      .orderBy($"k", $"ts").select($"name", $"quote").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull))
    assert(got.toSeq === Seq(
      ("e1", "q1"),  // 10 >= 5
      ("e2", "q2"),  // 25 >= 20
      ("e3", "q3"),  // inclusive: 30 >= 30
      ("e4", null))) // no quote at/before 15 for k=2
  }

  test("no quadratic plan: as-of is a single-shuffle window, not a nested loop") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "name")
    val right = Seq((1L, 5L, "q")).toDF("k", "ts", "quote")
    val df = AsOfJoin.backward(left, right, "k", "ts", Seq("quote"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected window-based plan, got:\n$plan")
  }

  test("tolerance nulls out stale matches (backwardWithin)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 106L, "e2")).toDF("k", "ts", "name")
    val right = Seq((1L, 99L, "q1")).toDF("k", "ts", "quote")
    val got = AsOfJoin.backwardWithin(left, right, "k", "ts", Seq("quote"), tolerance = 5L)
      .orderBy($"ts").select($"name", $"quote").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull))
    assert(got.toSeq === Seq(("e1", "q1"), ("e2", null))) // 106-99=7 > 5 → stale
  }

  test("payload name collision is rejected") {
    import spark.implicits._
    val df = Seq((1L, 1L, "a")).toDF("k", "ts", "quote")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.backward(df, df, "k", "ts", Seq("quote"))
    }
  }

  test("random data matches the brute-force as-of definition (fwd + bwd)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val keys = 1L to 3L
      val lrows = Seq.fill(40)((keys(rnd.nextInt(3)), rnd.nextInt(100).toLong))
        .distinct.map { case (k, t) => (k, t, s"L$k-$t") }
      // distinct right ts per key: ties among right rows would make the
      // matched payload order-dependent in ANY as-of definition
      val rrows = Seq.fill(25)((keys(rnd.nextInt(3)), rnd.nextInt(100).toLong))
        .distinct.map { case (k, t) => (k, t, s"R$k-$t") }
      val left = lrows.toDF("k", "ts", "name")
      val right = rrows.toDF("k", "ts", "quote")

      def brute(fwd: Boolean): Map[(Long, Long), String] =
        lrows.map { case (k, t, _) =>
          val cand = rrows.filter(r => r._1 == k && (if (fwd) r._2 >= t else r._2 <= t))
          val pick = if (cand.isEmpty) null
            else if (fwd) cand.minBy(_._2)._3 else cand.maxBy(_._2)._3
          (k, t) -> pick
        }.toMap

      for (fwd <- Seq(false, true)) {
        val op = if (fwd) AsOfJoin.forward _ else AsOfJoin.backward _
        val got = op(left, right, "k", "ts", Seq("quote"))
          .select($"k", $"ts", $"quote").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
        assert(got === brute(fwd), s"trial $trial fwd=$fwd")
      }
    }
  }
}
