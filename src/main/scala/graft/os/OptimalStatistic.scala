package graft.os

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Psd
import graft.analytics.Chain

/** Optimal-statistic cross-correlation pipeline (SURVEY §3.3) — the
  * reference's one genuinely relational heavy query.
  *
  * Reference flow (results.py:702-848, delegating the per-pair math to
  * enterprise_extensions.OptimalStatistic.compute_os):
  *   pulsar pairs (N(N−1)/2, results.py:316) → per-pair (xi, rho, sig)
  *   → OS = Σ(ρ·Γ/σ²)/Σ(Γ²/σ²), OS_err = 1/sqrt(Σ(Γ²/σ²)) per ORF Γ
  *   → noise-marginalisation over posterior draws (results.py:819-844)
  *   → equal-count angular bins (results.py:305-347).
  *
  * Scale design: the pair table is a self-join on idx inequality with the
  * (tiny) pulsar-position table broadcast — pairs live distributed, never
  * on the driver. The marginalisation joins DRAWS × PAIRS as a broadcast of
  * draws against the pair table partitioned by pair — per-draw recompute is
  * one shuffle-free map + one groupBy("draw").
  */
object OptimalStatistic {

  /** Pulsar pair table from (psr, idx, ra, dec): all idx_a < idx_b pairs
    * with the angular separation cos ζ from unit-vector dot products. */
  def pairs(psrs: DataFrame): DataFrame = {
    val withVec = psrs
      .withColumn("vx", cos(col("dec")) * cos(col("ra")))
      .withColumn("vy", cos(col("dec")) * sin(col("ra")))
      .withColumn("vz", sin(col("dec")))
    val a = withVec.select(col("psr").as("psr_a"), col("idx").as("ia"),
      col("vx").as("ax"), col("vy").as("ay"), col("vz").as("az"))
    val b = withVec.select(col("psr").as("psr_b"), col("idx").as("ib"),
      col("vx").as("bx"), col("vy").as("by"), col("vz").as("bz"))
    a.join(b, col("ia") < col("ib"))
      .withColumn("cos_zeta",
        col("ax") * col("bx") + col("ay") * col("by") + col("az") * col("bz"))
      .withColumn("xi", acos(least(greatest(col("cos_zeta"), lit(-1.0)), lit(1.0))))
      .select(col("psr_a"), col("psr_b"), col("ia"), col("ib"), col("cos_zeta"), col("xi"))
  }

  /** Attach an ORF column Γ for "hd" | "dipole" | "monopole". */
  def withOrf(pairTable: DataFrame, orf: String): DataFrame = {
    val g = orf match {
      case "hd" => Psd.hellingsDownsNoAuto(col("cos_zeta"))
      case "dipole" => Psd.dipole(col("cos_zeta"))
      case "monopole" => Psd.monopole(col("cos_zeta"))
      case other => throw new IllegalArgumentException(s"unknown ORF: $other")
    }
    pairTable.withColumn("orf", g)
  }

  /** OS point estimate over a pair table carrying (rho, sig, orf):
    * one-row DataFrame (os, os_err, snr). */
  def osEstimate(pairRho: DataFrame): DataFrame = {
    val num = sum(col("rho") * col("orf") / (col("sig") * col("sig")))
    val den = sum(col("orf") * col("orf") / (col("sig") * col("sig")))
    pairRho.agg(
      (num / den).as("os"),
      (lit(1.0) / sqrt(den)).as("os_err"))
      .withColumn("snr", col("os") / col("os_err"))
  }

  /** A15: noise-marginalised OS — draws × pairs, per-draw OS, then the
    * mean OS and mean SNR over draws (results.py:819-844; seeded draw
    * indices are an input, SURVEY §7.4.5 determinism discipline). */
  def marginalise(pairRhoPerDraw: DataFrame): DataFrame = {
    val num = sum(col("rho") * col("orf") / (col("sig") * col("sig")))
    val den = sum(col("orf") * col("orf") / (col("sig") * col("sig")))
    pairRhoPerDraw
      .groupBy(col("draw"))
      .agg((num / den).as("os"), (lit(1.0) / sqrt(den)).as("os_err"))
      .agg(avg(col("os")).as("os_marg"),
        avg(col("os") / col("os_err")).as("snr_marg"),
        count(lit(1)).as("n_draws"))
  }

  /** A12 applied to pairs: equal-count angular bins of (xi, rho, sig). */
  def binned(pairRho: DataFrame, nBins: Int = 8): DataFrame =
    Chain.equalCountBins(pairRho, col("xi"), col("rho"), col("sig"), nBins)
}
