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
        "q13_cust_distribution", // orders + customer
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
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).collect() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
