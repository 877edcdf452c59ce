package graft.llm

import graft.SparkTestBase

/** r10 plan-shape adoptions must be RESULT-invariant: each rewrite below
  * changed only the physical geometry (co-partitioned df join-back for nv1,
  * array-side zip_with bigrams for t10/t11, the probed-but-unadopted
  * prePartition/shjHint flags for bipartite BFS), so the shipped shape and
  * its probe arm must produce byte-identical rows. The interleaved probes
  * (Nv1Probe, T10Probe, BfsProbe) assert this at sf0.1/sf1; this spec pins
  * it in the suite at the fixture SF so a future edit to either arm that
  * drifts the semantics fails fast.
  */
class ShapeEquivalenceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("nv1: co-partitioned shuffle-hash df shape == agg+join-back shape") {
    val a = rows(QualityQueries.nv1Shape(spark, sf, copartition = false))
    val b = rows(QualityQueries.nv1Shape(spark, sf, copartition = true))
    assert(a.nonEmpty && a == b)
  }

  test("t10: array-zip bigram stream == window-lead bigram stream") {
    val a = rows(LlmQueries.t10Shape(spark, sf, arrayzip = false))
    val b = rows(LlmQueries.t10Shape(spark, sf, arrayzip = true))
    assert(a.nonEmpty && a == b)
  }

  test("t11: array-zip bigram stream == window-lead bigram stream") {
    val a = rows(LlmQueries.t11Shape(spark, sf, arrayzip = false))
    val b = rows(LlmQueries.t11Shape(spark, sf, arrayzip = true))
    assert(a.nonEmpty && a == b)
  }

  test("bfs bipartite: prePartition/shjHint arms == shipped levels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
    val src = graft.core.Tables.customer(spark, sf)
      .filter($"c_nationkey" === 0).select(($"c_custkey" * 2).as("v"))
    def lv(p: Boolean, h: Boolean): Seq[String] =
      rows(graft.operators.Bfs.levelsBipartite(e, src, maxDepth = 3, p, h)
        .orderBy($"level", $"v"))
    val shipped = lv(false, false)
    assert(shipped.nonEmpty)
    assert(lv(true, false) == shipped)
    assert(lv(true, true) == shipped)
  }
}
