package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dumps the FULL `.explain("formatted")` output of every query touched in
  * the round-10 optimization pass to one file per query — the before/after
  * plan evidence under plans/r10/. Unlike ExplainDump (which truncates to 80
  * lines for PLANS.md), this writes the complete plan including subqueries.
  * Usage: runMain graft.tools.PlanDumpR10 <outDir> <suffix> [sfDir]
  */
object PlanDumpR10 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local()
    val touched = Seq(
      "s3_ann_ivf_topk", "s4_kmeans_update", "s5_ann_ivf_multiprobe",
      "sem1_semantic_dedup", "knn1_knn_graph", "pq1_product_quant",
      "ivfpq1_ivf_adc_topk", "r2_ivf_recall",
      "pr1_pagerank", "ds1_dup_spans", "d5_embedding_neardup")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    touched.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(q) =>
          val full = q(spark, dir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
          java.nio.file.Files.writeString(p, full)
          println(s"[plandump] wrote $p")
        case None =>
          println(s"[plandump] SKIP $name (not declared at this commit)")
      }
    }
    spark.stop()
  }
}
