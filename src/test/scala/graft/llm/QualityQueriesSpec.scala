package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row

class QualityQueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("gq1: flags reproduce a local recompute of the rules") {
    val rows = QualityQueries.gq1(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stops = Set("the", "data", "query", "table", "scan", "join",
      "group", "order", "filter", "row")
    rows.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ").filter(_.nonEmpty)
      val nw = toks.length.toLong
      val mwl = toks.map(_.length).sum.toDouble / nw
      val nStop = toks.count(stops).toLong
      val shortFrac = toks.count(_.length <= 2).toDouble / nw
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_stop") == nStop)
      assert(r.getAs[Boolean]("r_wordcount") == (nw >= 30 && nw <= 80))
      assert(r.getAs[Boolean]("r_meanlen") == (mwl >= 4.3 && mwl <= 4.7))
      assert(r.getAs[Boolean]("r_stopwords") == (nStop >= 12))
      assert(r.getAs[Boolean]("r_shortwords") == (shortFrac <= 0.05))
      assert(r.getAs[Boolean]("r_symbols")) // corpus is pure lowercase words
      assert(r.getAs[Boolean]("pass") ==
        (r.getAs[Boolean]("r_wordcount") && r.getAs[Boolean]("r_meanlen") &&
          r.getAs[Boolean]("r_stopwords") && r.getAs[Boolean]("r_shortwords")))
    }
    // the gate must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("pass")))
    assert(rows.exists(r => !r.getAs[Boolean]("pass")))
  }

  test("ent1: entropy matches a local recompute and gates both ways") {
    val rows = QualityQueries.ent1(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size) // every doc scored
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      val counts = text.groupBy(identity).view.mapValues(_.length.toLong)
      val n = text.length.toLong
      // same fold order as the query: counts sorted by character
      val lp = counts.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
        acc + (c.toDouble / n) * math.log(c.toDouble / n)
      }
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong)
      val ent = BigDecimal(-lp).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(r.getAs[Double]("entropy") - ent.toDouble) < 1e-9)
      assert(r.getAs[Boolean]("keep") == (r.getAs[Double]("entropy") >= 2.0))
    }
    // natural word text sits well above the gate; discrimination is
    // asserted on range, not on a pathological fixture
    assert(rows.forall(_.getAs[Double]("entropy") > 0.0))
  }

  test("pii1: redaction counts are internally consistent") {
    val rows = QualityQueries.pii1(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      assert(n > 0)
      // every synthetic props carries exactly one digit run...
      assert(r.getAs[Long]("n_runs") == n)
      // ...so scrubbing collapses them all onto ONE shape per type
      assert(r.getAs[Long]("n_shapes") == 1L)
      assert(r.getAs[Long]("n_digit_chars") >= n) // ≥ 1 digit per run
      assert(r.getAs[Long]("v_min") <= r.getAs[Long]("v_max"))
      assert(r.getAs[Long]("v_sum") >= r.getAs[Long]("v_max"))
    }
  }

  test("dsir1: selection is importance-biased toward the target model") {
    val rows = QualityQueries.dsir1(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 16)
    rows.foreach(r => assert(!r.getAs[Double]("log_weight").isNaN))
    // the property importance resampling actually guarantees: the selected
    // set's mean log-weight exceeds the corpus mean (the languages here
    // share one vocabulary, so a per-language majority claim would be
    // asserting noise — the tempered key makes the BIAS, not the label,
    // the testable invariant)
    val selMean = rows.map(_.getAs[Double]("log_weight")).sum / rows.length
    val all = QualityQueries.dsir1Stats(spark, sf)
    assert(selMean > all, f"selected mean lw $selMean%.4f !> corpus mean $all%.4f")
  }

  test("bpe4/encode: replaying merges reproduces the sequential gold state") {
    // pure-function check: encode ≡ applying trainLocal's merges in order
    val wf = Seq("ababab" -> 5L, "abc" -> 3L, "banana" -> 2L, "a" -> 7L)
    val merges = BpeTrainer.trainLocal(wf, 4).map(m => (m.lhs, m.rhs))
    for ((w, _) <- wf) {
      var t = w.split("").filter(_.nonEmpty).toVector
      for ((a, b) <- merges) t = BpeTrainer.mergeOne(t, a, b)
      assert(BpeTrainer.encode(w, merges) == t, s"encode mismatch for $w")
      assert(t.mkString("") == w, "encoding must preserve the word's chars")
    }
    // greedy left-to-right: first merge is the most frequent pair
    assert(merges.nonEmpty)
  }

  test("bpe4: end-to-end compression is >= 1 and char-conserving") {
    val rows = IndexQueries.bpe4(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_subtokens") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("n_subtokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Double]("compression") >= 1.0)
    }
    // 8 merges on this corpus must actually compress something
    assert(rows.exists(r => r.getAs[Double]("compression") > 1.0))
  }

  test("sem1: dropped ids are distinct from keepers and thresholds hold") {
    val rows = LlmQueries.sem1(spark, sf).collect()
    // sf0.001 may or may not surface near-dups; invariants must hold either way
    rows.foreach { r =>
      assert(r.getAs[Long]("keeper") < r.getAs[Long]("dropped_id"))
      assert(r.getAs[Double]("max_cos") > 0.35 - 1e-9)
      assert(r.getAs[Long]("n_dups") >= 1L)
    }
  }

  test("qf1: floor is each source's median score, keep splits every source") {
    val rows = QualityQueries.qf1(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      // one floor per source, and keep == (score >= floor) row-wise
      assert(rs.map(_.getAs[Double]("floor")).distinct.length == 1, src)
      rs.foreach { r =>
        assert(r.getAs[Boolean]("keep") ==
          (r.getAs[Double]("score") >= r.getAs[Double]("floor")))
      }
      // a MEDIAN floor must actually discriminate within each source
      // (all docs in a source sharing one score would make the gate vacuous)
      assert(rs.exists(_.getAs[Boolean]("keep")), src)
      assert(rs.exists(r => !r.getAs[Boolean]("keep")), src)
    }
  }
}
