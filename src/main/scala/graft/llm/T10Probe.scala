package graft.llm

/** Interleaved one-JVM A/B for the t10/t11 bigram-stream geometry
  * ([[LlmQueries.bigrams]]): the r9-shipped window form (Exchange(doc_id) +
  * Sort + WindowExec lead, computed once per consumer) vs array-side
  * zip_with pairs before the explode (the tc1 edge-build device — no
  * doc-keyed exchange, no per-doc sort). Full query outputs asserted
  * identical every round.
  *
  * Usage: runMain graft.llm.T10Probe <sfDir> [rounds=3]
  */
object T10Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()

    def run(q: String, arrayzip: Boolean): (Double, Seq[String]) = {
      val df = q match {
        case "t10" => LlmQueries.t10Shape(spark, dir, arrayzip)
        case "t11" => LlmQueries.t11Shape(spark, dir, arrayzip)
      }
      val t0 = System.nanoTime()
      val out = df.collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, out)
    }

    for (q <- Seq("t10", "t11")) {
      run(q, false); run(q, true) // warm-up: codegen + memoized docTokens
      var (bw, bz) = (Double.MaxValue, Double.MaxValue)
      (1 to rounds).foreach { r =>
        val (tw, ow) = run(q, false)
        val (tz, oz) = run(q, true)
        require(ow == oz, s"$q arrayzip output differs!")
        bw = math.min(bw, tw); bz = math.min(bz, tz)
        println(f"[t10probe] $q round $r window $tw%.3f s  arrayzip $tz%.3f s")
      }
      // ADVICE r10: the A/B is mildly asymmetric — the window arm reads the
      // memoized docTokens checkpoint warmed in this JVM while the arrayzip
      // arm re-tokenizes from parquet every run, UNDERSTATING the arrayzip
      // win; flag it on the record line.
      println(f"[t10probe] RESULT $q window_best=$bw%.3f s (warm docTokens ckpt)  arrayzip_best=$bz%.3f s (re-tokenizes per run — asymmetry favors window)")
    }
    spark.stop()
  }
}
