package graft.tools

/** Interleaved one-JVM A/B for kc1's shared edge/degree materialization
  * (VERDICT r10 directive 4): the r10 shape built the co-supply edge set
  * twice (k-derivation degree scalar + peelRounds' round-0 checkpoint) and
  * paid the edge-wide degree aggregation twice; the r11 shape checkpoints
  * both once and hands them to the peel. Full peel profiles asserted
  * identical every round.
  *
  * Usage: runMain graft.tools.Kc1Probe <sfDir> [rounds=3]
  */
object Kc1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    import graft.operators.KCore

    def run(shared: Boolean): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val out = graft.relational.GraphQueries.kc1Shape(spark, dir,
          KCore.LocalFinishNodes, KCore.LocalFinishEdges, sharedBuild = shared)
        .collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, out)
    }

    run(false); run(true) // warm-up
    var (bo, bs) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (to_, oo) = run(false)
      val (ts, os) = run(true)
      require(oo == os, "kc1 shared-build profile differs!")
      bo = math.min(bo, to_); bs = math.min(bs, ts)
      println(f"[kc1probe] round $r: r10 $to_%.3f s  shared $ts%.3f s")
    }
    println(f"[kc1probe] RESULT r10_best=$bo%.3f s  shared_best=$bs%.3f s")
    spark.stop()
  }
}
