package graft.tools

/** Interleaved one-JVM A/B for TriangleCount's pinned checkpoint
  * partitioning (r11 — the assertHashPartitioned device found via pr1):
  * the r10 shape's o/adj localCheckpoints came back UnknownPartitioning
  * under AQE, so the adjacency groupBy and both SHUFFLE_HASH triangle
  * joins re-exchanged edge/adjacency-volume data the construction had
  * already partitioned by src. One-row outputs asserted identical.
  *
  * Usage: runMain graft.tools.Tc1Probe <sfDir> [rounds=3]
  */
object Tc1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    def run(pinned: Boolean): (Double, Seq[String]) = {
      val e = graft.core.Tables.lineitem(spark, dir)
        .groupBy($"l_partkey")
        .agg(org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.collect_set($"l_suppkey")).as("sups"))
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr(
            """zip_with(slice(sups, 1, size(sups) - 1),
              |         slice(sups, 2, size(sups) - 1),
              |         (a, b) -> struct(a AS u, b AS v))""".stripMargin)).as("e"))
        .select($"e.u", $"e.v").distinct()
      val df = graft.operators.TriangleCount.run(e, pinnedPartitions = pinned)
      val t0 = System.nanoTime()
      val out = df.collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, out)
    }

    run(false); run(true) // warm-up
    var (bc, bp) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (tc, oc) = run(false)
      val (tp, op) = run(true)
      require(oc == op, "tc1 pinned-partition stats differ!")
      bc = math.min(bc, tc); bp = math.min(bp, tp)
      println(f"[tc1probe] round $r: unpinned $tc%.3f s  pinned $tp%.3f s")
    }
    println(f"[tc1probe] RESULT unpinned_best=$bc%.3f s  pinned_best=$bp%.3f s")
    spark.stop()
  }
}
