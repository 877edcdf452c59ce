package graft.llm

import graft.SparkTestBase

/** mix3 epoch scheduling and ord1 deterministic global order. */
class CorpusScheduleSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("mix3: budget conservation, cap semantics, and discrimination") {
    val rows = CorpusQueries.mix3(spark, sf).collect()
    assert(rows.nonEmpty)
    val totTokens = rows.map(_.getAs[Long]("tokens")).sum
    val totTarget = rows.map(_.getAs[Long]("target_tokens")).sum
    // targets partition the 2× budget (up to per-source floor() truncation)
    assert(math.abs(totTarget - 2L * totTokens) <= rows.length)
    rows.foreach { r =>
      val epochs = r.getAs[Double]("epochs")
      assert(r.getAs[Boolean]("capped") == (epochs > 2.0))
      assert(r.getAs[Long]("realized_tokens") <= r.getAs[Long]("target_tokens"))
      // realized = min(epochs, 2) * tokens, so never above 2 epochs' worth
      assert(r.getAs[Long]("realized_tokens") <= 2L * r.getAs[Long]("tokens"))
      assert(epochs > 0.0)
    }
    // sub-linear weights must split the sources around the cap
    assert(rows.exists(_.getAs[Boolean]("capped")))
    assert(rows.exists(r => !r.getAs[Boolean]("capped")))
  }

  test("ord1: ranks are a contiguous prefix of the hash-ordered permutation") {
    val rows = CorpusQueries.ord1(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 25L))
    rows.foreach { r =>
      assert(r.getAs[Long]("h") ==
        (r.getAs[Long]("doc_id") * 2654435761L) % 4294967296L)
    }
    // ordered by (h, doc_id), and these are the 25 SMALLEST keys globally
    val keys = rows.map(r => (r.getAs[Long]("h"), r.getAs[Long]("doc_id"))).toSeq
    assert(keys == keys.sorted)
    val all = graft.core.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).map(id => ((id * 2654435761L) % 4294967296L, id)).sorted
    assert(keys == all.take(25).toSeq)
  }
}
