package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.udaf
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

class AggregatorsSpec extends SparkTestBase {

  test("WeightedMean matches the analytic inverse-variance formula") {
    import spark.implicits._
    val data = Seq((1.0, 0.5), (2.0, 1.0), (3.0, 2.0))
    val ds = data.toDF("rho", "sig")
    val res = ds.select(udaf(Aggregators.WeightedMean)
      .apply($"rho", $"sig")).head().getStruct(0)
    val (mean, err) = (res.getDouble(0), res.getDouble(1))
    val ws = data.map { case (_, s) => 1.0 / (s * s) }
    val expMean = data.zip(ws).map { case ((r, _), w) => r * w }.sum / ws.sum
    val expErr = math.sqrt(1.0 / ws.sum)
    assert(math.abs(mean - expMean) < 1e-12)
    assert(math.abs(err - expErr) < 1e-12)
  }

  test("WeightedMean merge is associative and commutative (partial agg safe)") {
    val gen = Gen.listOfN(3, Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0.1, 10.0)))
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[(Double, Double)]) =
        l.foldLeft(Aggregators.WeightedMean.zero)(Aggregators.WeightedMean.reduce)
      val m = Aggregators.WeightedMean.merge _
      val (a, b, c) = (buf(xs), buf(ys), buf(zs))
      val left = m(m(a, b), c)
      val right = m(a, m(b, c))
      val swap = m(b, a)
      def close(x: (Double, Double), y: (Double, Double)) =
        math.abs(x._1 - y._1) < 1e-9 && math.abs(x._2 - y._2) < 1e-9
      close(left, right) && close(m(a, b), swap)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(50))
    assert(r.passed, r.status.toString)
  }

  test("HistMode finds the argmax bin left edge, lowest-bin ties") {
    import spark.implicits._
    // 10 bins over [0, 10): values cluster in bin 3
    val vals = Seq(0.5, 3.1, 3.2, 3.9, 7.5, 7.6, 3.5).toDS()
    val agg = udaf(new Aggregators.HistMode(10, 0.0, 10.0))
    val mode = vals.select(agg(vals("value"))).head().getDouble(0)
    assert(mode === 3.0)
  }

  test("HistMode clamps the top edge into the last bin") {
    import spark.implicits._
    val vals = Seq(10.0, 10.0, 1.0).toDS()
    val agg = udaf(new Aggregators.HistMode(10, 0.0, 10.0))
    assert(vals.select(agg(vals("value"))).head().getDouble(0) === 9.0)
  }

  test("MisraGries keeps every item with count > n/(k+1) (exact-stream run)") {
    val a = new Aggregators.MisraGries(3)
    // 100×"a", 80×"b", 10 singletons: n=190, n/(k+1)=47.5 → a and b must survive
    val stream = List.fill(100)("a") ++ List.fill(80)("b") ++
      (1 to 10).map(i => s"x$i")
    val keys = a.finish(stream.foldLeft(a.zero)(a.reduce)).toSet
    assert(keys.contains("a") && keys.contains("b"))
  }

  test("MisraGries buffer never exceeds k entries and merge preserves the guarantee") {
    val k = 4
    val a = new Aggregators.MisraGries(k)
    val tokGen = Gen.frequency((8, Gen.const("hot")), (4, Gen.const("warm")),
      (1, Gen.oneOf("c", "d", "e", "f", "g", "h")))
    val gen = Gen.listOf(tokGen)
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[String]) = l.foldLeft(a.zero)(a.reduce)
      val (x, y, z) = (buf(xs), buf(ys), buf(zs))
      val mLeft = a.merge(a.merge(x, y), z)
      val mRight = a.merge(x, a.merge(y, z))
      val all = xs ++ ys ++ zs
      val n = all.size
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong)
      // deterministic guarantee: true heavy hitters survive ANY merge tree
      val hh = exact.filter { case (_, c) => c * (k + 1) > n }.keys.toSet
      val sizesOk = Seq(x, y, z, mLeft, mRight).forall(_.size <= k)
      sizesOk && hh.subsetOf(a.finish(mLeft).toSet) &&
        hh.subsetOf(a.finish(mRight).toSet)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(r.passed, r.status.toString)
  }

  private def bottomKRef(k: Int, ids: Seq[Long]): Seq[Long] = {
    def pri(v: Long): Long = (v * 2654435761L) & 0xFFFFFFFFL
    ids.distinct.sortBy(v => (pri(v), v)).take(k)
  }

  test("BottomK equals sort-by-priority-take-k on a DataFrame") {
    import spark.implicits._
    val ids = (0L until 500L).map(i => i * 7919L % 100000L)
    val agg = udaf(new Aggregators.BottomK(6))
    val got = ids.toDF("id").select(agg($"id")).head().getSeq[Long](0)
    assert(got.toSeq === bottomKRef(6, ids))
  }

  test("BottomK merge is associative, commutative, and order-insensitive") {
    val a = new Aggregators.BottomK(5)
    val gen = Gen.listOf(Gen.choose(0L, 1000L))
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[Long]) = l.foldLeft(a.zero)(a.reduce)
      val (x, y, z) = (buf(xs), buf(ys), buf(zs))
      // merge mutates nothing observable across orderings of the SAME data
      val left = a.merge(a.merge(buf(xs), buf(ys)), buf(zs)).toSeq
      val right = a.merge(buf(xs), a.merge(buf(ys), buf(zs))).toSeq
      val swap = a.merge(buf(ys), buf(xs)).toSeq
      val all = a.finish(buf(xs ++ ys ++ zs)).toSeq
      left == right && a.merge(buf(xs), buf(ys)).toSeq == swap &&
        left == all && all == bottomKRef(5, xs ++ ys ++ zs)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(r.passed, r.status.toString)
  }

  test("MinK equals distinct-sort-take-k on a DataFrame") {
    import spark.implicits._
    val ids = (0L until 500L).map(i => i * 7919L % 1000L) // duplicates by design
    val agg = udaf(new Aggregators.MinK(8))
    val got = ids.toDF("id").select(agg($"id")).head().getSeq[Long](0)
    assert(got.toSeq === ids.distinct.sorted.take(8))
  }

  test("MinK merge is associative, commutative, duplicate-idempotent") {
    val a = new Aggregators.MinK(5)
    val gen = Gen.listOf(Gen.choose(0L, 100L)) // tight range → many duplicates
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[Long]) = l.foldLeft(a.zero)(a.reduce)
      val left = a.merge(a.merge(buf(xs), buf(ys)), buf(zs)).toSeq
      val right = a.merge(buf(xs), a.merge(buf(ys), buf(zs))).toSeq
      val swap = a.merge(buf(ys), buf(xs)).toSeq
      val all = a.finish(buf(xs ++ ys ++ zs)).toSeq
      left == right && a.merge(buf(xs), buf(ys)).toSeq == swap &&
        left == all && all == (xs ++ ys ++ zs).distinct.sorted.take(5)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(r.passed, r.status.toString)
  }

  private def topKRef(k: Int, pairs: Seq[(Long, Long)]): Seq[Long] =
    pairs.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)

  test("TopKByScore equals sort-desc-take-k on a DataFrame") {
    import spark.implicits._
    val pairs = (0L until 400L).map(i => ((i * 2654435761L) % 997L, i))
    val agg = udaf(new Aggregators.TopKByScore(5))
    val got = pairs.toDF("s", "id").select(agg($"s", $"id")).head().getSeq[Long](0)
    assert(got.toSeq === topKRef(5, pairs))
  }

  private def bkpRef(k: Int, pairs: Seq[(Double, Long)]): Seq[Long] =
    pairs.sortBy(identity).take(k).map(_._2)

  test("BottomKByPriority equals sort-by-(p,id)-take-k on a DataFrame") {
    import spark.implicits._
    val pairs = (0L until 400L).map(i => (((i * 2654435761L) % 997L).toDouble / 997.0, i))
    val agg = udaf(new Aggregators.BottomKByPriority(5))
    val got = pairs.toDF("p", "id").select(agg($"p", $"id")).head().getSeq[Long](0)
    assert(got.toSeq === bkpRef(5, pairs))
  }

  test("BottomKByPriority merge is associative, commutative, matches single-pass") {
    val a = new Aggregators.BottomKByPriority(4)
    val gen = Gen.listOf(Gen.zip(
      Gen.choose(0, 50).map(_ / 50.0), Gen.choose(0L, 10000L))) // tight p range → ties
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[(Double, Long)]) = l.foldLeft(a.zero)(a.reduce)
      def v(b: (Array[Double], Array[Long])) = (b._1.toSeq, b._2.toSeq)
      val left = v(a.merge(a.merge(buf(xs), buf(ys)), buf(zs)))
      val right = v(a.merge(buf(xs), a.merge(buf(ys), buf(zs))))
      val swap = v(a.merge(buf(ys), buf(xs)))
      val all = a.finish(buf(xs ++ ys ++ zs)).toSeq
      left == right && v(a.merge(buf(xs), buf(ys))) == swap &&
        all == bkpRef(4, xs ++ ys ++ zs)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(r.passed, r.status.toString)
  }

  private def bksRef(k: Int, pairs: Seq[(String, Long)]): Seq[Long] =
    pairs.sortBy(identity).take(k).map(_._2)

  test("BottomKByStringKey equals sort-by-(key,id)-take-k on a DataFrame") {
    import spark.implicits._
    val pairs = (0L until 300L).map(i => (f"${(i * 7919L) % 64L}%02x", i))
    val agg = udaf(new Aggregators.BottomKByStringKey(5))
    val got = pairs.toDF("k", "id").select(agg($"k", $"id")).head().getSeq[Long](0)
    assert(got.toSeq === bksRef(5, pairs))
  }

  test("BottomKByStringKey merge is associative, commutative, matches single-pass") {
    val a = new Aggregators.BottomKByStringKey(3)
    val gen = Gen.listOf(Gen.zip(
      Gen.choose(0, 20).map(i => f"$i%02d"), Gen.choose(0L, 10000L))) // ties by design
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[(String, Long)]) = l.foldLeft(a.zero)(a.reduce)
      def v(b: (Array[String], Array[Long])) = (b._1.toSeq, b._2.toSeq)
      val left = v(a.merge(a.merge(buf(xs), buf(ys)), buf(zs)))
      val right = v(a.merge(buf(xs), a.merge(buf(ys), buf(zs))))
      val swap = v(a.merge(buf(ys), buf(xs)))
      val all = a.finish(buf(xs ++ ys ++ zs)).toSeq
      left == right && v(a.merge(buf(xs), buf(ys))) == swap &&
        all == bksRef(3, xs ++ ys ++ zs)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(r.passed, r.status.toString)
  }

  test("TopKByScore merge is associative, commutative, and matches single-pass") {
    val a = new Aggregators.TopKByScore(4)
    val gen = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 10000L)))
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[(Long, Long)]) = l.foldLeft(a.zero)(a.reduce)
      val left = a.merge(a.merge(buf(xs), buf(ys)), buf(zs)).toSeq
      val right = a.merge(buf(xs), a.merge(buf(ys), buf(zs))).toSeq
      val swap = a.merge(buf(ys), buf(xs)).toSeq
      val all = a.finish(buf(xs ++ ys ++ zs)).toSeq
      // duplicate (score, id) pairs occupy two slots; compare on distinct
      val distinctAll = a.finish(buf((xs ++ ys ++ zs).distinct)).toSeq
      left == right && a.merge(buf(xs), buf(ys)).toSeq == swap &&
        distinctAll == topKRef(4, (xs ++ ys ++ zs).distinct)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(r.passed, r.status.toString)
  }

  test("GramMatrix merge is associative, commutative, and matches single-pass") {
    val dim = 4
    val a = new Aggregators.GramMatrix(dim)
    val vecGen = Gen.listOfN(dim, Gen.choose(-1000L, 1000L)).map(_.toSeq)
    val gen = Gen.listOf(vecGen)
    def ref(vs: List[Seq[Long]]): Seq[Long] = {
      val m = new Array[Long](dim * dim)
      for (v <- vs; i <- 0 until dim; j <- i until dim)
        m(i * dim + j) += v(i) * v(j)
      m.toSeq
    }
    val prop = forAll(gen, gen, gen) { (xs, ys, zs) =>
      def buf(l: List[Seq[Long]]) = l.foldLeft(a.zero)(a.reduce)
      val left = a.merge(a.merge(buf(xs), buf(ys)), buf(zs)).toSeq
      val right = a.merge(buf(xs), a.merge(buf(ys), buf(zs))).toSeq
      val swap = a.merge(buf(ys), buf(xs)).toSeq
      left == right && a.merge(buf(xs), buf(ys)).toSeq == swap &&
        a.finish(buf(xs ++ ys ++ zs)) == ref(xs ++ ys ++ zs)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(100))
    assert(r.passed, r.status.toString)
  }
}
