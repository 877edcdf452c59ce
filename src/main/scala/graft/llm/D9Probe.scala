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
    if (args.headOption.contains("--stages")) { stages(args(1)); return }
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val docs = LlmQueries.d9Docs(spark, dir).localCheckpoint()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val arms = Seq("naive", "positional", "indexed")
    // candidate volume per arm (the mechanism, measured once)
    val cand = arms.map(a => a -> LlmQueries.d9Pairs(docs, a).count()).toMap
    arms.foreach(a => LlmQueries.d9From(docs, a).count()) // warm pipelines
    val best = collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    var outs = Map.empty[String, Long]
    (1 to rounds).foreach { r =>
      outs = arms.map { a =>
        val (t, n) = time(LlmQueries.d9From(docs, a).count())
        best(a) = math.min(best(a), t)
        print(f"[d9probe-r$r] $a $t%.3fs  ")
        a -> n
      }.toMap
      println()
    }
    require(outs.values.toSet.size == 1, s"arms diverge: $outs")
    println(f"[d9probe] RESULT dir=$dir out_pairs=${outs.head._2} " +
      arms.map(a => f"cand_$a=${cand(a)} best_$a=${best(a)}%.3fs").mkString(" "))
    spark.stop()
  }

  /** Wall split of the full d9: docs build (tokenize → df join → sorted
    * collect → checkpoint) vs the pair+verify stages the A/B times — at
    * sf1 the build is most of the query, so slope work must aim there. */
  private def stages(dir: String): Unit = {
    val spark = graft.core.GraftSession.local()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d9stages] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    (1 to 3).foreach { round =>
      println(s"[d9stages] --- round $round ---")
      val docs = time("docs build (df agg+join) + checkpoint") {
        LlmQueries.d9DocsShape(spark, dir, "aggjoin").localCheckpoint()
      }
      time("docs build (df window) + checkpoint") {
        LlmQueries.d9DocsShape(spark, dir, "window").localCheckpoint()
      }
      time("docs build (df copartition) + checkpoint") {
        LlmQueries.d9DocsShape(spark, dir, "copartition").localCheckpoint()
      }
      time("pairs + verify") {
        LlmQueries.d9From(docs, "indexed").count()
      }
    }
    spark.stop()
  }
}
