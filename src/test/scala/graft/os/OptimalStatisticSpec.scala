package graft.os

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class OptimalStatisticSpec extends SparkTestBase {

  private def psrs = {
    import spark.implicits._
    // 5 pulsars spread in RA on the equator
    (0 until 5).map(i => (s"J000$i", i.toLong, i * math.Pi / 5, 0.0))
      .toDF("psr", "idx", "ra", "dec")
  }

  test("pair table has N(N-1)/2 rows with xi = RA separation on the equator") {
    val p = OptimalStatistic.pairs(psrs)
    assert(p.count() === 10)
    val xi01 = p.filter(col("ia") === 0 && col("ib") === 1).head()
      .getAs[Double]("xi")
    assert(math.abs(xi01 - math.Pi / 5) < 1e-12)
  }

  test("OS recovers a pure-HD-signal amplitude exactly") {
    // rho_ab = A * orf_ab with constant sig → OS = A, by construction
    val a = 3.7e-30
    val withOrf = OptimalStatistic.withOrf(OptimalStatistic.pairs(psrs), "hd")
      .withColumn("rho", lit(a) * col("orf"))
      .withColumn("sig", lit(1e-30))
    val est = OptimalStatistic.osEstimate(withOrf).head()
    assert(math.abs(est.getAs[Double]("os") / a - 1) < 1e-12)
    assert(est.getAs[Double]("snr") > 0)
  }

  test("ORF selection: dipole is cos zeta, monopole is 1, hd-noauto is 0 at zero sep") {
    val p = OptimalStatistic.pairs(psrs)
    val d = OptimalStatistic.withOrf(p, "dipole")
    val row = d.filter(col("ia") === 0 && col("ib") === 1).head()
    assert(math.abs(row.getAs[Double]("orf") - math.cos(math.Pi / 5)) < 1e-12)
    val m = OptimalStatistic.withOrf(p, "monopole")
    assert(m.select(min("orf"), max("orf")).head().toSeq === Seq(1.0, 1.0))
    assertThrows[IllegalArgumentException] {
      OptimalStatistic.withOrf(p, "bogus")
    }
  }

  test("marginalisation averages per-draw OS over draws") {
    val base = OptimalStatistic.withOrf(OptimalStatistic.pairs(psrs), "hd")
      .withColumn("sig", lit(1.0))
    // two draws with amplitudes 2 and 4 → mean OS 3
    val d1 = base.withColumn("draw", lit(0)).withColumn("rho", lit(2.0) * col("orf"))
    val d2 = base.withColumn("draw", lit(1)).withColumn("rho", lit(4.0) * col("orf"))
    val marg = OptimalStatistic.marginalise(d1.unionByName(d2)).head()
    assert(math.abs(marg.getAs[Double]("os_marg") - 3.0) < 1e-12)
    assert(marg.getAs[Long]("n_draws") === 2)
  }

  test("equal-count binning produces balanced angular bins") {
    val withRho = OptimalStatistic.withOrf(OptimalStatistic.pairs(psrs), "hd")
      .withColumn("rho", col("orf"))
      .withColumn("sig", lit(1.0))
    val b = OptimalStatistic.binned(withRho, 2)
    assert(b.count() === 2)
    assert(b.agg(sum("npairs")).head().getLong(0) === 10)
  }
}
