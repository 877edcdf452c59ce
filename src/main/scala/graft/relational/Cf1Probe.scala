package graft.relational

/** Interleaved one-JVM A/B: cf1 with vs without the capped-profile
  * localCheckpoint (the topk UDAF agg otherwise re-runs for each of its
  * three consumers — exchange reuse dedupes only the shuffle).
  * Usage: runMain graft.relational.Cf1Probe <dir> [rounds=3]
  */
object Cf1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val fn = graft.SparkEntry.queries("cf1_item_similarity")
    def run(ckpt: Boolean): (Double, Seq[String]) = {
      sys.props("graft.cf1.checkpoint") = ckpt.toString
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    run(false); run(true)
    var (tn, tc) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (a, ra) = run(false)
      val (b, rb) = run(true)
      require(ra == rb, "arms diverge")
      tn = math.min(tn, a); tc = math.min(tc, b)
      println(f"[cf1probe] round $r: no-ckpt $a%.3fs ckpt $b%.3fs")
    }
    println(f"[cf1probe] RESULT no_ckpt_best=$tn%.3fs ckpt_best=$tc%.3fs")
    spark.stop()
  }
}
