package graft.llm

import graft.SparkTestBase

/** cal1 reliability bins vs an independent local recompute from the
  * already-spec'd lr1 scores and gq1 gate at sf0.001. */
class CalibrationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("cal1: bins partition the corpus and match a local score×gate join") {
    val scores = QualityQueries.lrScored(spark, dir)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gate = QualityQueries.gqRules(spark, dir)
      .select("doc_id", "pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(scores.keySet === gate.keySet)

    val goldBins = scores.groupBy { case (_, sc) =>
      val sr = BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.floor(sr * 10).toLong
    }
    val rows = QualityQueries.cal1(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === scores.size.toLong)
    assert(rows.map(_.getLong(0)).toSet === goldBins.keySet)
    for (r <- rows) {
      val bin = r.getLong(0)
      val docs = goldBins(bin)
      assert(r.getLong(1) === docs.size.toLong, s"n_docs bin $bin")
      assert(r.getLong(3) === docs.keys.count(gate), s"n_pass bin $bin")
      // mean score sits inside the bin's decile corridor
      assert(r.getDouble(2) >= bin / 10.0 - 1e-6 &&
        r.getDouble(2) < (bin + 1) / 10.0 + 1e-6, s"mean_score bin $bin")
    }
    // the diagram is informative, not flat: the two score halves pass the
    // gate at visibly different rates. (On this corpus the lr1 score is
    // ANTI-correlated with the gq1 gate — hi≈0.18 vs lo≈0.34 — which is
    // precisely the miscalibration cal1 exists to expose before anyone
    // swaps the learned filter in for the rules.)
    val (lo, hi) = rows.partition(_.getLong(0) < 5)
    def rate(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getLong(3)).sum.toDouble / math.max(1L, rs.map(_.getLong(1)).sum)
    assert(math.abs(rate(hi) - rate(lo)) > 0.05, s"hi=${rate(hi)} lo=${rate(lo)}")
  }
}
