package graft.llm

/** Interleaved one-JVM A/B for ds1's run-detection shape: the r9 rank
  * window over (pair, delta) + two aggregations vs the r10 single
  * mergeable hash aggregation with an array-fold run length
  * ([[LlmQueries.dupSpansShape]]). Outputs asserted identical every round
  * (both are exact longest-common-substring-in-shingles).
  *
  * Usage: runMain graft.llm.Ds1Probe <sfDir> [rounds=4]
  */
object Ds1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.core.GraftSession.local()
    val docs = graft.core.Tables.documents(spark, dir)
    def run(shape: String): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val out = LlmQueries.dupSpansShape(docs, minTokens = 5, freqCap = 8,
        runShape = shape).collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, out)
    }
    run("window"); run("agg"); run("aggckpt") // warm codegen + page cache
    var (bw, ba, bc) = (Double.MaxValue, Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (tw, ow) = run("window"); val (ta, oa) = run("agg")
      val (tc, oc) = run("aggckpt")
      require(ow == oa && oa == oc, "ds1 arms diverge")
      bw = math.min(bw, tw); ba = math.min(ba, ta); bc = math.min(bc, tc)
      println(f"[ds1probe] round $r: window $tw%.3fs agg $ta%.3fs aggckpt $tc%.3fs (${ow.size} pairs)")
    }
    println(f"[ds1probe] RESULT window_best=$bw%.3fs agg_best=$ba%.3fs aggckpt_best=$bc%.3fs")
    spark.stop()
  }
}
