package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved one-JVM A/B for pr1's per-iteration edge exchange (VERDICT
  * r10 directive 6): the r10 shape's AQE-coalesced `repartition(col("b"))`
  * checkpoint re-exchanged the full edge table on `b` inside EVERY
  * iteration join (executed-plan evidence in
  * plans/r11/pr1_iteration_executed_before.txt); pinning the build
  * repartition to the session shuffle count lets the checkpoint advertise
  * exact hashpartitioning(b, P) so each round only shuffles the node-sized
  * rank table. Fixed-point integer ranks ⇒ outputs asserted bit-identical
  * every round.
  *
  * Usage: runMain graft.tools.Pr1Probe <sfDir> [rounds=3]
  */
object Pr1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    def run(pinned: Boolean): (Double, Seq[String]) = {
      val edges = graft.core.Tables.lineitem(spark, dir)
        .join(graft.core.Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      val df = graft.operators.PageRank.run(edges, iters = 3,
          pinnedBuildPartitions = pinned)
        .select($"v".as("node"), $"rank".as("microrank"))
        .orderBy($"node")
      val t0 = System.nanoTime()
      val out = df.collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, out)
    }

    run(false); run(true) // warm-up
    var (bc, bp) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (tc, oc) = run(false)
      val (tp, op) = run(true)
      require(oc == op, "pr1 pinned-partition ranks differ!")
      bc = math.min(bc, tc); bp = math.min(bp, tp)
      println(f"[pr1probe] round $r: coalesced $tc%.3f s  pinned $tp%.3f s")
    }
    println(f"[pr1probe] RESULT coalesced_best=$bc%.3f s  pinned_best=$bp%.3f s")
    spark.stop()
  }
}
