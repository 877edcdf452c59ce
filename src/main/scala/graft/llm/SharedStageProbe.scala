package graft.llm

import org.apache.spark.sql.DataFrame

/** Interleaved one-JVM A/B for the r11 shared-stage rewrites (VERDICT r10
  * directive 3 + ADVICE r10): queries that aggregated one stream several
  * times with different keys now derive every coarser aggregate from the
  * finest-grain count table, so all consumers hang off ONE exchange
  * (ReusedExchange at runtime) and — for the arrayzip bigram stream, which
  * re-tokenizes from parquet per consumer — the stream is computed once.
  *
  *  - t9:    dfT + n_docs derived from the (doc_id, tok) counts
  *  - t8:    unigram table derived from the (doc_id, tok) counts
  *  - t10:   global bigram counts derived from the per-doc bigram counts
  *  - t11:   total bigram count derived from the (w1, w2) count table
  *  - dsir1: raw/target unigram models derived from (doc_id, lang, tok)
  *
  * Full query outputs asserted identical every round (the derivations are
  * exact-integer sum-over-finer-grain identities). Both arms re-tokenize
  * or read the same memoized docTokens checkpoint SYMMETRICALLY — each arm
  * runs the full declared query.
  *
  * Usage: runMain graft.llm.SharedStageProbe <sfDir> [rounds=3] [queries]
  */
object SharedStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val qs = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("t9", "t8", "t10", "t11", "dsir1", "t7"))
    val spark = graft.core.GraftSession.local()

    def run(q: String, shared: Boolean): (Double, Seq[String]) = {
      val df: DataFrame = q match {
        case "t9" => LlmQueries.t9Shape(spark, dir, sharedStage = shared)
        case "t8" => LlmQueries.t8Shape(spark, dir, sharedStage = shared)
        case "t10" => LlmQueries.t10Shape(spark, dir, arrayzip = true,
          derivedCounts = shared)
        case "t11" => LlmQueries.t11Shape(spark, dir, arrayzip = true,
          derivedNb = shared)
        case "t7" => LlmQueries.t7Shape(spark, dir, copartition = shared)
        case "dsir1" =>
          // full dsir1 on top of the shape under test (deterministic
          // Gumbel top-16 — bit-stable output)
          import org.apache.spark.sql.functions._
          import spark.implicits._
          val u = (graft.operators.GlobalRank.knuthHash($"doc_id") + 1)
            .cast("double") / 4294967297.0
          QualityQueries.dsirScoredShape(spark, dir, sharedStage = shared)
            .withColumn("key", lit(8.0) * $"lw" - log(-log(u)))
            .orderBy($"key".desc, $"doc_id")
            .limit(16)
            .select($"doc_id", $"n_tokens", round($"lw", 6).as("log_weight"),
              round($"key", 6).as("gumbel_key"))
      }
      val t0 = System.nanoTime()
      val out = df.collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, out)
    }

    for (q <- qs) {
      run(q, false); run(q, true) // warm-up: codegen + memoized docTokens
      var (bo, bs) = (Double.MaxValue, Double.MaxValue)
      (1 to rounds).foreach { r =>
        val (to_, oo) = run(q, false)
        val (ts, os) = run(q, true)
        require(oo == os, s"$q shared-stage output differs!")
        bo = math.min(bo, to_); bs = math.min(bs, ts)
        println(f"[sharedstage] $q round $r: r10 $to_%.3f s  shared $ts%.3f s")
      }
      println(f"[sharedstage] RESULT $q r10_best=$bo%.3f s  shared_best=$bs%.3f s")
    }
    spark.stop()
  }
}
