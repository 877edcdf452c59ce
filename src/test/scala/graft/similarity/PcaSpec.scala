package graft.similarity

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val dim = 64

  private lazy val model = Pca.fit(Tables.embeddings(spark, dir), "embedding", dim, 8)

  // driver-side reference moments from the same data
  private lazy val raw: Array[Array[Double]] = Tables.embeddings(spark, dir)
    .select("embedding").collect()
    .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("fit recovers the data's mean and covariance eigenstructure") {
    val n = raw.length.toDouble
    val mu = Array.tabulate(dim)(i => raw.map(_(i)).sum / n)
    // scaled-integer quantization in fit rounds each component to 1e-6
    model.mean.zip(mu).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5) }

    // eigen residual: C·w ≈ λ·w for every kept component
    val c = Array.tabulate(dim, dim)((i, j) =>
      raw.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n)
    for (j <- 0 until model.k) {
      val w = model.components(j)
      val cw = Array.tabulate(dim)(i => (0 until dim).map(l => c(i)(l) * w(l)).sum)
      val resid = math.sqrt(cw.zip(w).map { case (x, y) =>
        val d = x - model.eigenvalues(j) * y; d * d }.sum)
      assert(resid < 1e-6, s"eigen residual $resid for component $j")
    }
  }

  test("components are orthonormal and eigenvalues descend") {
    for (a <- 0 until model.k; b <- a until model.k) {
      val dot = model.components(a).zip(model.components(b)).map(t => t._1 * t._2).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"W($a)·W($b) = $dot")
    }
    val ev = model.eigenvalues
    assert(ev.zip(ev.tail).forall { case (x, y) => x >= y - 1e-12 })
    assert(ev.forall(_ >= -1e-9))
  }

  test("distributed projection variance matches the eigenvalues") {
    val proj = Pca.transformDf(Tables.embeddings(spark, dir), "embedding", model)
    val aggs = (0 until model.k).flatMap(j =>
      Seq(avg(col(s"pc$j")).as(s"m$j"),
        avg(col(s"pc$j") * col(s"pc$j")).as(s"s$j")))
    val r = proj.agg(aggs.head, aggs.tail: _*).head()
    for (j <- 0 until model.k) {
      val m = r.getAs[Double](s"m$j")
      val s2 = r.getAs[Double](s"s$j") - m * m
      assert(math.abs(m) < 1e-6) // centered projections have ~zero mean
      assert(math.abs(s2 - model.eigenvalues(j)) < 1e-6,
        s"var(pc$j)=$s2 vs lambda=${model.eigenvalues(j)}")
    }
  }

  test("fit is partitioning-invariant (mergeable moments)") {
    val df = Tables.embeddings(spark, dir)
    val m1 = Pca.fit(df.repartition(1), "embedding", dim, 3)
    val m17 = Pca.fit(df.repartition(17), "embedding", dim, 3)
    // the distributed pass is exact-integer, so the models are identical
    // bit for bit, not merely close
    assert(m1.mean.sameElements(m17.mean))
    assert(m1.eigenvalues.sameElements(m17.eigenvalues))
    for (j <- 0 until 3)
      assert(m1.components(j).sameElements(m17.components(j)))
  }
}
