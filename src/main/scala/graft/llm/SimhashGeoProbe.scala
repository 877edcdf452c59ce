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
  *
  * The synthetic mode validates the [[LlmQueries.simhashComboThreshold]]
  * crossover EMPIRICALLY at corpus sizes the fixtures can't reach: the
  * BandProbe generator (uniform xxhash64 16-bit chunks + a 64×64
  * near-identical skew block as the true-pair recall load) feeds the two
  * REAL candidate arms end-to-end, popcount verify included.
  */
object SimhashGeoProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    val (sh, dir, rounds) =
      if (args.headOption.contains("--synthetic")) {
        val n = args(1).toLong
        val r = args.lift(2).map(_.toInt).getOrElse(3)
        val mask = (1L << 16) - 1
        val docs = spark.range(n).select(
          (($"id" + 1000000000L).as("doc_id") +:
            (0 until 4).map(c => org.apache.spark.sql.functions
              .abs(org.apache.spark.sql.functions.xxhash64($"id",
                org.apache.spark.sql.functions.lit(c)))
              .bitwiseAND(org.apache.spark.sql.functions.lit(mask))
              .as(s"sh$c"))): _*)
        val skew = spark.range(64L * 64).select(
          ($"id".as("doc_id") +:
            (0 until 4).map(c => org.apache.spark.sql.functions
              .abs(org.apache.spark.sql.functions.xxhash64($"id" % 64,
                org.apache.spark.sql.functions.lit(100 + c)))
              .bitwiseAND(org.apache.spark.sql.functions.lit(mask))
              .as(s"sh$c"))): _*)
        (docs.unionByName(skew).localCheckpoint(), s"synthetic-n$n", r)
      } else {
        val d = args(0)
        val r = args.lift(1).map(_.toInt).getOrElse(3)
        (graft.text.TextOps.simhashChunks(
          LlmQueries.docTids(spark, d)).localCheckpoint(), d, r)
      }
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
