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
  *
  * r11 adds the shared-stage rewrites (t7/t8/t9/t10/t11/dsir1/kc1 — every
  * coarser aggregate derived from the finest-grain count table of ONE
  * exchange; exact integer identities, probed by SharedStageProbe and
  * Kc1Probe) and the two-level IVF assignment's invariants (flat
  * degeneracy at gate-SF k, fine-stage join-strategy independence; the
  * k > threshold geometry is oracle-proven, not identity-proven — see
  * Ivf2Probe).
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

  // ---- r11 shared-stage rewrites (exact sum-over-finer-grain identities)

  test("t9: shared (doc_id, tok) stage == independent aggregations") {
    val a = rows(LlmQueries.t9Shape(spark, sf, sharedStage = false))
    val b = rows(LlmQueries.t9Shape(spark, sf, sharedStage = true))
    assert(a.nonEmpty && a == b)
  }

  test("t8: unigram table derived from (doc_id, tok) counts == direct") {
    val a = rows(LlmQueries.t8Shape(spark, sf, sharedStage = false))
    val b = rows(LlmQueries.t8Shape(spark, sf, sharedStage = true))
    assert(a.nonEmpty && a == b)
  }

  test("t10: global bigram counts derived from per-doc counts == direct") {
    val a = rows(LlmQueries.t10Shape(spark, sf, arrayzip = true, derivedCounts = false))
    val b = rows(LlmQueries.t10Shape(spark, sf, arrayzip = true, derivedCounts = true))
    assert(a.nonEmpty && a == b)
  }

  test("t11: nb derived from pre-filter count table == direct stream count") {
    val a = rows(LlmQueries.t11Shape(spark, sf, arrayzip = true, derivedNb = false))
    val b = rows(LlmQueries.t11Shape(spark, sf, arrayzip = true, derivedNb = true))
    assert(a.nonEmpty && a == b)
  }

  test("t7: one co-partitioning exchange == three independent exchanges") {
    val a = rows(LlmQueries.t7Shape(spark, sf, copartition = false))
    val b = rows(LlmQueries.t7Shape(spark, sf, copartition = true))
    assert(a.nonEmpty && a == b)
  }

  test("dsir1 scored: shared (doc_id, lang, tok) stage == three passes") {
    import org.apache.spark.sql.functions.col
    def arm(s: Boolean) = rows(
      QualityQueries.dsirScoredShape(spark, sf, sharedStage = s).orderBy(col("doc_id")))
    val a = arm(false); val b = arm(true)
    assert(a.nonEmpty && a == b)
  }

  test("kc1: shared edge/degree materialization == rebuilt-per-consumer") {
    import graft.operators.KCore
    def arm(s: Boolean) = rows(graft.relational.GraphQueries.kc1Shape(
      spark, sf, KCore.LocalFinishNodes, KCore.LocalFinishEdges, sharedBuild = s))
    val a = arm(false); val b = arm(true)
    assert(a.nonEmpty && a == b)
  }

  // ---- r11 two-level IVF assignment invariants

  test("ivf: auto mode routes flat at k <= threshold") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val cents = LlmQueries.ivfCentsAt(spark, e, 20) // <= ivfTwoLevelMin
    val a = rows(LlmQueries.ivfCellsAt(spark, e, cents, "flat")
      .orderBy(org.apache.spark.sql.functions.col("vec_id")))
    val b = rows(LlmQueries.ivfCellsAt(spark, e, cents, "auto")
      .orderBy(org.apache.spark.sql.functions.col("vec_id")))
    assert(a.nonEmpty && a == b)
  }

  test("ivf: fine-stage broadcast == shuffle_hash at two-level k") {
    // needs k > ivfTwoLevelMin=256 centroids, so the 500-vector sf0.01
    // fixture (the gate SF) stands in for the 50-vector one
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cents = LlmQueries.ivfCentsAt(spark, e, 300)
    val a = rows(LlmQueries.ivfCellsAt(spark, e, cents, "twolevel")
      .orderBy(org.apache.spark.sql.functions.col("vec_id")))
    val b = rows(LlmQueries.ivfCellsAt(spark, e, cents, "twolevel-shuffle")
      .orderBy(org.apache.spark.sql.functions.col("vec_id")))
    assert(a.nonEmpty && a == b)
  }

  // ---- r11 pinned checkpoint partitioning (assertHashPartitioned):
  // physical-only — outputs must be bit-identical with the pin off

  test("pr1: pinned build partitioning == coalesced (bit-identical ranks)") {
    import spark.implicits._
    def arm(pin: Boolean) = {
      val edges = graft.core.Tables.lineitem(spark, sf)
        .join(graft.core.Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      rows(graft.operators.PageRank.run(edges, iters = 3,
          pinnedBuildPartitions = pin)
        .orderBy($"v"))
    }
    val a = arm(false); val b = arm(true)
    assert(a.nonEmpty && a == b)
  }

  test("tc1 operator: pinned o/adj partitioning == unpinned (same stats row)") {
    import spark.implicits._
    val e = graft.core.Tables.lineitem(spark, sf)
      .select($"l_partkey".as("p"), $"l_suppkey".as("s")).distinct()
      .withColumn("v", org.apache.spark.sql.functions.lead($"s", 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"p").orderBy($"s")))
      .filter($"v".isNotNull).select($"s".as("u"), $"v").distinct()
    val a = rows(graft.operators.TriangleCount.run(e, pinnedPartitions = false))
    val b = rows(graft.operators.TriangleCount.run(e, pinnedPartitions = true))
    assert(a.nonEmpty && a == b)
  }

  test("lp1 operator: pinned sym partitioning == unpinned labels") {
    import spark.implicits._
    val e = graft.core.Tables.lineitem(spark, sf)
      .select($"l_partkey".as("u"), $"l_suppkey".as("v")).distinct()
    def arm(pin: Boolean) = rows(
      graft.operators.LabelPropagation.run(e, rounds = 3, prePartition = pin)
        .orderBy($"node"))
    val a = arm(false); val b = arm(true)
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
