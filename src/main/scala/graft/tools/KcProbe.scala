package graft.tools

/** Interleaved A/B of kc1's local-tail-finish guard geometries in ONE JVM
  * (separate runs swing 2–3× with host noise): the r7 guard
  * (4096 nodes / 2¹⁸ edges, which at sf1 misses round-2's 4,170
  * survivors) vs the r8 guard (32768 / 2²⁰ with the degree-sum edge
  * bound, which catches round 1). Output parity is asserted every round.
  *
  * Usage: runMain graft.tools.KcProbe <dir> [rounds=3]
  */
object KcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    // guard geometry as EXPLICIT parameters (kc1Guard) — the r8 sys.props
    // dial leaked into any later KCore use in the same JVM (ADVICE r8)
    def run(nodes: Long, edges: Long): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = graft.relational.GraphQueries.kc1Guard(spark, dir, nodes, edges)
        .collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    run(4096L, 1L << 18); run(32768L, 1L << 20) // warm both paths
    var (tOld, tNew) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (a, ra) = run(4096L, 1L << 18)
      val (b, rb) = run(32768L, 1L << 20)
      require(ra == rb, s"guard geometries diverge: $ra vs $rb")
      tOld = math.min(tOld, a); tNew = math.min(tNew, b)
      println(f"[kcprobe] round $r: old(4096/2^18) $a%.3fs new(32768/2^20) $b%.3fs")
    }
    println(f"[kcprobe] RESULT dir=$dir old_best=$tOld%.3fs new_best=$tNew%.3fs")
    spark.stop()
  }
}
