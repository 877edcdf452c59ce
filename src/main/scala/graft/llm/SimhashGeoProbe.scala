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
  */
object SimhashGeoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val sh = graft.text.TextOps.simhashChunks(
      LlmQueries.docTids(spark, dir)).localCheckpoint()
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
