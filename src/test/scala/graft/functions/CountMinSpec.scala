package graft.functions

import graft.SparkTestBase
import graft.functions.Aggregators.CountMin
import org.scalacheck.Gen

class CountMinSpec extends SparkTestBase {

  private val D = 4
  private val W = 64

  private def sketchOf(items: Seq[Long]): Array[Long] = {
    val a = new CountMin(D, W)
    items.foldLeft(a.zero)(a.reduce)
  }

  private def est(sk: Array[Long], x: Long): Long =
    (0 until D).map(r => sk(r * W + CountMin.index(r, x, W))).min

  test("estimate never underestimates and is exact when collision-free") {
    val items = Seq.fill(200)(Gen.choose(0L, 50L).sample.get)
    val sk = sketchOf(items)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (x, c) => assert(est(sk, x) >= c, s"item $x") }
    // min over 4 rows into 64 cells with ≤51 distinct keys: excess is
    // bounded by the colliding mass; at least the total is conserved per row
    (0 until D).foreach(r =>
      assert(sk.slice(r * W, (r + 1) * W).sum === items.size.toLong))
  }

  test("merge is elementwise addition and order-independent (sketch of union)") {
    val g = Gen.listOfN(120, Gen.choose(0L, 40L))
    for (_ <- 1 to 10) {
      val (xs, ys) = (g.sample.get, g.sample.get)
      val a = new CountMin(D, W)
      val direct = sketchOf(xs ++ ys)
      val merged = a.merge(sketchOf(xs), sketchOf(ys))
      val swapped = a.merge(sketchOf(ys), sketchOf(xs))
      assert(merged.toSeq === direct.toSeq)
      assert(swapped.toSeq === direct.toSeq)
    }
  }

  test("aggregator index matches the SQL probe expression pmod(xxhash64(x, r), w)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = Seq(0L, 1L, 42L, -7L, Long.MaxValue, Long.MinValue, 123456789L)
    val cols = col("x") +: (0 until D).map(r =>
      pmod(xxhash64($"x", lit(r.toLong)), lit(W.toLong)).cast("int").as(s"i$r"))
    val rows = xs.toDF("x").select(cols: _*).collect()
    rows.foreach { row =>
      val x = row.getLong(0)
      (0 until D).foreach(r =>
        assert(row.getInt(1 + r) === CountMin.index(r, x, W), s"x=$x row=$r"))
    }
  }

  test("distributed udaf build equals the driver-side sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val items = Seq.tabulate(500)(i => (i % 37).toLong)
    val cm = udaf(new CountMin(D, W))
    val got = items.toDF("x").repartition(8)
      .agg(cm($"x")).head().getSeq[Long](0)
    assert(got.toSeq === sketchOf(items).toSeq)
  }
}
