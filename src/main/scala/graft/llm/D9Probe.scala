package graft.llm

/** Interleaved A/B timing of d9's two candidate arms (naive prefix
  * equijoin vs hashed-key + PPJoin-positional-filter) over the same
  * checkpointed d9Docs frame — the r8 probe the r6/r7 verdicts asked for
  * (d9 was the steepest measured sf1 slope, 0.68, candidate fan-out).
  * One JVM, alternating, because separate runs swing 2–3× with host
  * noise. Also prints the candidate-count cut, the mechanism behind any
  * timing delta.
  *
  * Usage: runMain graft.llm.D9Probe <dir> [rounds=3]
  */
object D9Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val docs = LlmQueries.d9Docs(spark, dir).localCheckpoint()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // candidate volume per arm (the mechanism, measured once)
    val candNaive = LlmQueries.d9Pairs(docs, positional = false).count()
    val candPos = LlmQueries.d9Pairs(docs, positional = true).count()
    // warm both full pipelines, then interleave
    LlmQueries.d9From(docs, positional = false).count()
    LlmQueries.d9From(docs, positional = true).count()
    var (tn, tp) = (Double.MaxValue, Double.MaxValue)
    var (on, op) = (0L, 0L)
    (1 to rounds).foreach { r =>
      val (a, oa) = time(LlmQueries.d9From(docs, positional = false).count())
      val (b, ob) = time(LlmQueries.d9From(docs, positional = true).count())
      on = oa; op = ob
      tn = math.min(tn, a); tp = math.min(tp, b)
      println(f"[d9probe] round $r: naive $a%.3fs positional $b%.3fs")
    }
    require(on == op, s"arms diverge: naive=$on positional=$op")
    println(f"[d9probe] RESULT dir=$dir out_pairs=$on " +
      f"cand_naive=$candNaive cand_positional=$candPos " +
      f"naive_best=$tn%.3fs positional_best=$tp%.3fs")
    spark.stop()
  }
}
