package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dumps the INTERNAL stage plans that the top-level query explains cannot
  * show because they sit behind eager localCheckpoint / memoize boundaries
  * (the final plan reads `Scan ExistingRDD` where the build used to be):
  *
  *   - `ivfcells_after.txt` — the r10 IVF cell assignment (corpus-sized k,
  *     map-side-combining max_by argmax). The r9 window-argmax "before" is
  *     dumped by the same-named tool run at the round-9 commit.
  *   - `pr1_build_{before,after}.txt` — PageRank's symmetric-edges-with-
  *     degree build. "before" replicates the r9 shipped shape verbatim
  *     (upstream (a,b) distinct + degree agg on a + degree join + redundant
  *     repartition — the singleExchangeBuild=false arm of PageRank.run plus
  *     GraphQueries.pr1's retired upstream distinct); "after" is the adopted
  *     raw-edges single-exchange build (PageRank.scala:81-95).
  *   - `d5_pairs_after.txt` — d5's pair pipeline above its localCheckpoint
  *     (BoundedSelfJoin cap 512); the before-file's top-level plan shows the
  *     same pipeline un-materialized under the global sort.
  *
  * Usage: runMain graft.llm.StagePlanDumpR10 <outDir> [sfDir]
  */
object StagePlanDumpR10 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val p = java.nio.file.Paths.get(outDir, s"$name.txt")
      java.nio.file.Files.writeString(p,
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"[stageplan] wrote $p")
    }

    // IVF cell assignment, r10 shape (plan only — nothing is executed)
    val e = graft.core.Tables.embeddings(spark, dir)
    val k = LlmQueries.ivfK(e.count())
    dump("ivfcells_after",
      LlmQueries.ivfCellsAt(spark, e, LlmQueries.ivfCentsAt(spark, e, k)))

    // pr1 edge build, both shapes (mirrors PageRank.scala:81-95; the
    // "before" arm additionally carries GraphQueries.pr1's r9 upstream
    // distinct, exactly the r9-shipped lineage)
    val rawEdges = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
    def doubled(edges: DataFrame) = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val beforeBidir = doubled(rawEdges.distinct()) // assumeDistinct held at r9
    val beforeDeg = beforeBidir.groupBy(col("a").as("v")).agg(count(lit(1)).as("deg"))
    dump("pr1_build_before", beforeBidir
      .join(beforeDeg.select(col("v").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a"), col("b"), col("deg_b"))
      .repartition(col("b")))
    val part = doubled(rawEdges).repartition(col("b"))
    val sym = part.distinct()
    val degB = sym.groupBy(col("b")).agg(count(lit(1)).as("deg_b"))
    val after = sym.join(degB.hint("shuffle_hash"), "b")
      .select(col("a"), col("b"), col("deg_b"))
    dump("pr1_build_after", after)
    // the initial plan above prints the two identical hashpartitioning(b)
    // subtrees separately; prove the runtime dedup by executing THIS
    // DataFrame's own QueryExecution (foreach runs queryExecution.toRdd, so
    // the AdaptiveSparkPlan finalizes in place) and dumping the final plan
    // (AQE's stage cache reuses the canonical-equal shuffle)
    after.queryExecution.toRdd.count() // execute THIS QE's adaptive plan
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "pr1_build_after_executed.txt"),
      after.queryExecution.executedPlan.toString)
    println(s"[stageplan] wrote $outDir/pr1_build_after_executed.txt")

    // nv1 shingle-df geometry, both shapes (nv1Shape(copartition=false) is
    // code-identical to the query as shipped before the r10 adoption)
    dump("nv1_novelty_score_before", QualityQueries.nv1Shape(spark, dir, copartition = false))
    dump("nv1_novelty_score_after", QualityQueries.nv1Shape(spark, dir, copartition = true))

    // t10/t11 bigram-stream geometry, both shapes (the window arm is
    // code-identical to the queries as shipped before the r10 adoption)
    dump("t10_bigram_logprob_before", LlmQueries.t10Shape(spark, dir, arrayzip = false))
    dump("t10_bigram_logprob_after", LlmQueries.t10Shape(spark, dir, arrayzip = true))
    dump("t11_pmi_collocations_before", LlmQueries.t11Shape(spark, dir, arrayzip = false))
    dump("t11_pmi_collocations_after", LlmQueries.t11Shape(spark, dir, arrayzip = true))

    // d5 pair pipeline above its localCheckpoint (LlmQueries.d5 minus the
    // materialization + sort tail)
    val emb = graft.core.Tables.embeddings(spark, dir)
      .withColumn("n2", graft.similarity.VectorOps.dotNative($"embedding", $"embedding"))
    dump("d5_pairs_after",
      graft.operators.BoundedSelfJoin.pairs(emb, "label", "vec_id", cap = 512)
        .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"),
          (graft.similarity.VectorOps.dotNative($"a.embedding", $"b.embedding") /
            (sqrt($"a.n2") * sqrt($"b.n2"))).as("cos"))
        .filter($"cos" > 0.4))
    spark.stop()
  }
}
