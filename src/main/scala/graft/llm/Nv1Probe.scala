package graft.llm

/** Interleaved one-JVM A/B for nv1's shingle-df geometry
  * ([[QualityQueries.nv1Shape]]): the r9-shipped agg+join-back (the shingle
  * stream computed twice, exchanged twice) vs the d9DocsShape co-partition
  * device (one repartition(sh) feeding both the df aggregation and a
  * shuffle-hash join-back). Outputs asserted identical every round.
  *
  * Usage: runMain graft.llm.Nv1Probe <sfDir> [rounds=3]
  */
object Nv1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()

    def run(copartition: Boolean): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val out = QualityQueries.nv1Shape(spark, dir, copartition)
        .collect().map(_.toString).toSeq
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (t, out)
    }

    run(false); run(true) // warm-up: codegen + scan cache, both arms
    var (ba, bb) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (ta, oa) = run(false)
      val (tb, ob) = run(true)
      require(oa == ob, "copartition arm output differs!")
      ba = math.min(ba, ta); bb = math.min(bb, tb)
      println(f"[nv1probe] round $r aggjoin $ta%.3f s  copart $tb%.3f s")
    }
    println(f"[nv1probe] RESULT aggjoin_best=$ba%.3f s  copart_best=$bb%.3f s")
    spark.stop()
  }
}
