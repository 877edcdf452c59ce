package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Interleaved one-JVM A/B for bfs1's round-join geometry
  * ([[graft.operators.Bfs.levelsBipartite]]): the shipped unpartitioned
  * edge checkpoint vs a checkpoint pre-partitioned on the odd-round probe
  * key (the lp1/pr1 device), each with and without a SHUFFLE_HASH hint on
  * the frontier side. Arms alternate per round over the real bfs1 graph;
  * the full bfs1 aggregate (level, n_nodes, sum_ids) is asserted identical
  * across arms every round.
  *
  * Usage: runMain graft.tools.BfsProbe <sfDir> [rounds=3]
  */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    def run(prePartition: Boolean, shjHint: Boolean): (Double, Seq[String]) = {
      val e0 = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      val sources = Tables.customer(spark, dir)
        .filter($"c_nationkey" === 0).select(($"c_custkey" * 2).as("v"))
      val t0 = System.nanoTime()
      val out = graft.operators.Bfs
        .levelsBipartite(e0, sources, maxDepth = 3, prePartition, shjHint)
        .groupBy($"level")
        .agg(count(lit(1)).as("n_nodes"), sum($"v").as("sum_ids"))
        .orderBy($"level")
        .collect().map(_.toString).toSeq
      val t = (System.nanoTime() - t0) / 1e9
      // probe hygiene: the returned frame's level checkpoints are the only
      // live blocks (Bfs frees the rest); drop them so 20+ runs in one JVM
      // don't accumulate storage and skew later arms with GC pressure
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (t, out)
    }

    val arms = Seq(
      ("shipped", false, false), ("prepart", true, false),
      ("prepart+shj", true, true), ("shj-only", false, true))
    arms.foreach { case (_, p, h) => run(p, h) } // warm-up: codegen + scan cache
    val best = scala.collection.mutable.Map[String, Double]()
    (1 to rounds).foreach { r =>
      var ref: Seq[String] = null
      arms.foreach { case (name, p, h) =>
        val (t, out) = run(p, h)
        if (ref == null) ref = out
        else require(out == ref, s"arm $name output differs from shipped!")
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
        println(f"[bfsprobe] round $r $name%-12s $t%.3f s")
      }
    }
    arms.foreach { case (name, _, _) =>
      println(f"[bfsprobe] RESULT $name%-12s best=${best(name)}%.3f s")
    }
    spark.stop()
  }
}
