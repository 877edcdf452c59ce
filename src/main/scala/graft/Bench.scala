package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. `collect()` forces the
  * full plan; result sets are aggregate-sized so driver transfer is noise. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    // Warm the JVM/codegen path and the OS page cache for EVERY base table
    // once (one cheap query per table family) so per-query numbers measure
    // the engine, not first-call classloading or cold parquet reads.
    Seq("q1_pricing_summary", // lineitem
        "q13_customer_distribution", // orders + customer
        "q5_local_supplier", // supplier + nation + region
        "q19_disjunctive_revenue", // part
        "t3_token_stats", // documents
        "s1_ann_brute_topk", // embeddings
        "a4_model_counts") // events
      .foreach(name => SparkEntry.queries.get(name)
        .foreach(fn => try fn(spark, sfDir).collect() catch { case _: Throwable => () }))
    // best-of-3 with a FRESH DataFrame per run: each timed run pays full
    // analysis + optimization + execution (reusing one DataFrame would let
    // AQE serve the second run from materialized shuffle stages — cached
    // intermediates, not a benchmark). The duplicate-plan codegen cache
    // hit between runs absorbs Janino/JIT warmup, which otherwise
    // dominates sub-second queries (observed 5-15s first-run stalls).
    // Three runs, not two: this host shows sporadic multi-second external
    // stalls (CPU steal) that can hit both of two runs back-to-back.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      def run(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).collect() } catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      var times = (1 to 3).map(_ => run())
      // spread-triggered extra iterations: a single host CPU-steal stall
      // can poison even best-of-3 when it spans runs; a max/min ratio > 5
      // is the stall signature (engine variance is far tighter), so rerun
      // up to twice more and let min() discard the stalled samples.
      var extra = 0
      while (extra < 2 && times.max / math.max(times.min, 1e-9) > 5.0) {
        times = times :+ run()
        extra += 1
      }
      (name, times.min, times.max, err)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, mn, mx, _) =>
      "\"" + k + "\":" + f"${mx / math.max(mn, 1e-9)}%.1f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The long per-query lines go FIRST; the driver tail-truncates long
    // output, so the machine-read line must be the SHORT final one.
    println(f"""{"metric":"per_query","unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(f"""{"metric":"spread_max_over_min","spreads":$spreads}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")

    // Full per-query artifact, persisted to the repo so driver stdout
    // tail-truncation can never lose entries (round-3/4 lesson: the
    // per_query map survived only partially in BENCH_r{N}.json). One row
    // per query with best/worst seconds and error status; the round
    // number is inferred from the highest committed BENCH_r*.json.
    val round = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .foldLeft(0)(math.max) + 1
    val detail = results.map { case (k, mn, mx, err) =>
      val e = err.map(m => Verify.jsonQ(m)).getOrElse("null")
      f"""  "$k": {"best_sec": $mn%.3f, "worst_sec": $mx%.3f, "err": $e}"""
    }.mkString("{\n", ",\n", "\n}")
    val payload = f"""{"sf": "$sfDir", "n_queries": ${results.size}, "total_best_sec": $total%.3f, "queries": $detail}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(f"BENCH_DETAIL_r$round%02d.json"), payload)
    spark.stop()
  }
}
