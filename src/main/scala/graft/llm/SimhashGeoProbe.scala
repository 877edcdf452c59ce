package graft.llm

import org.apache.spark.sql.SparkSession

/** Interleaved A/B timing of the two EXACT simhash candidate geometries
  * (4×16-bit chunk bands vs 20-combo 32-bit block keys) over the same
  * checkpointed hash table — the measurement that sets
  * [[LlmQueries.simhashComboThreshold]]. Interleaved in ONE JVM because
  * separate runs swing 2–3× with host noise; the shared checkpoint
  * isolates the geometry term from the (identical) hashing cost.
  *
  * Usage: runMain graft.llm.SimhashGeoProbe <dir> [rounds=3]
  *    or: runMain graft.llm.SimhashGeoProbe --synthetic <nDocs> [rounds=3]
  *    or: runMain graft.llm.SimhashGeoProbe --zipf <nDocs> [rounds=3]
  *
  * The synthetic mode validates the [[LlmQueries.simhashComboThreshold]]
  * crossover EMPIRICALLY at corpus sizes the fixtures can't reach: the
  * BandProbe generator (uniform xxhash64 16-bit chunks + a 64×64
  * near-identical skew block as the true-pair recall load) feeds the two
  * REAL candidate arms end-to-end, popcount verify included.
  *
  * The zipf mode is the SKEWED-corpus re-test the r8 dial comment demanded
  * (short docs / boilerplate templates concentrate chunk values, which
  * pulls the band16 knee earlier): each chunk value draws, independently
  * per chunk, from a 20%-weight Zipf(1) head over ranks 1..4095
  * (inverse-CDF rank = ⌊exp(u·ln 4096)⌋, P(rank r) ∝ 1/r, so the hottest
  * value carries 20%·ln2/ln4096 ≈ 1.7% of ALL docs) with the remaining
  * 80% uniform over the 2¹⁶ space. Per-chunk self-match probability Σp²
  * MEASURES at ≈ 5.7e-4 (the probe prints it per run) vs 1.5e-5 uniform —
  * a ~37× candidate inflation for the 1-chunk band16 keys, while the
  * 3-block combo keys square-ish it away. Same 64×64 true-pair block.
  */
object SimhashGeoProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def skewBlock = spark.range(64L * 64).select(
      ($"id".as("doc_id") +:
        (0 until 4).map(c => abs(xxhash64($"id" % 64, lit(100 + c)))
          .bitwiseAND(lit((1L << 16) - 1)).as(s"sh$c"))): _*)
    val (sh, dir, rounds) =
      if (args.headOption.contains("--synthetic")) {
        val n = args(1).toLong
        val r = args.lift(2).map(_.toInt).getOrElse(3)
        val mask = (1L << 16) - 1
        val docs = spark.range(n).select(
          (($"id" + 1000000000L).as("doc_id") +:
            (0 until 4).map(c => abs(xxhash64($"id", lit(c)))
              .bitwiseAND(lit(mask)).as(s"sh$c"))): _*)
        (docs.unionByName(skewBlock).localCheckpoint(), s"synthetic-n$n", r)
      } else if (args.headOption.contains("--zipf")) {
        val n = args(1).toLong
        val r = args.lift(2).map(_.toInt).getOrElse(3)
        val docs = spark.range(n).select(
          (($"id" + 1000000000L).as("doc_id") +:
            (0 until 4).map { c =>
              val pick = abs(xxhash64($"id", lit(c), lit(1)))
              val u = (abs(xxhash64($"id", lit(c), lit(2))) % 1000000L)
                .cast("double") / lit(1e6)
              val headVal = floor(exp(u * lit(math.log(4096.0)))).cast("long")
              val unifVal = abs(xxhash64($"id", lit(c), lit(3)))
                .bitwiseAND(lit((1L << 16) - 1))
              when(pick % 5 === 0, headVal).otherwise(unifVal).as(s"sh$c")
            }): _*)
        (docs.unionByName(skewBlock).localCheckpoint(), s"zipf-n$n", r)
      } else {
        val d = args(0)
        val r = args.lift(1).map(_.toInt).getOrElse(3)
        (graft.text.TextOps.simhashChunks(
          LlmQueries.docTids(spark, d)).localCheckpoint(), d, r)
      }
    // skew diagnostic: per-chunk self-match probability Σ p² (the band16
    // candidate rate per unordered pair is ~4× this; uniform = 2^-16)
    val nDocs = sh.count().toDouble
    val selfp = (0 until 4).map { c =>
      sh.groupBy(col(s"sh$c")).count()
        .agg(sum(col("count") * (col("count") - 1)).cast("double") /
          lit(nDocs) / lit(nDocs))
        .head().getDouble(0)
    }
    println(f"[geoprobe] per-chunk self-match p2: ${selfp.map(p => f"$p%.2e").mkString(" ")}")
    val n = sh.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(geo: String): (Double, Long) = {
      var out = 0L
      val t = time {
        val p = if (geo == "combo") LlmQueries.simhashComboPairs(spark, sh)
                else LlmQueries.simhashBand16Pairs(spark, sh)
        out = p.count()
      }
      (t, out)
    }
    // warm both paths once (codegen compile, shuffle service), then measure
    run("band16"); run("combo")
    var (b16, cmb) = (Double.MaxValue, Double.MaxValue)
    var (pb, pc) = (0L, 0L)
    (1 to rounds).foreach { r =>
      val (tb, ob) = run("band16"); val (tc, oc) = run("combo")
      pb = ob; pc = oc
      b16 = math.min(b16, tb); cmb = math.min(cmb, tc)
      println(f"[geoprobe] round $r: band16 $tb%.3fs combo $tc%.3fs")
    }
    require(pb == pc, s"geometry outputs diverge: band16=$pb combo=$pc")
    println(f"[geoprobe] RESULT dir=$dir docs=$n pairs=$pb " +
      f"band16_best=$b16%.3fs combo_best=$cmb%.3fs")
    spark.stop()
  }
}
