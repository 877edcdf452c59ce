package graft.llm

import org.apache.spark.sql.execution.ExplainMode

/** Dumps the FULL `.explain("formatted")` output of every query touched in
  * the round-11 optimization pass to one file per query — the before/after
  * plan evidence under plans/r11/. "before" files are dumped by running
  * this same tool in a worktree at the r10-close commit (the t8/t9/t10/
  * t11/t7/dsir1 shapes there are the shipped ones); "after" files from
  * HEAD.
  *
  * Extras beyond the declared-query dumps:
  *  - `ivfcells_{flat,twolevel}_<suffix>.txt` — the IVF cell-assignment
  *    stage plan at the sf-dial k, both arms (it hides behind the memoize
  *    checkpoint in the top-level s3/sem1/knn1 explains). At the r10
  *    commit the tool has no mode parameter and dumps the flat shape only.
  *  - `pr1_iteration_executed_<suffix>.txt` — pr1's EXECUTED adaptive
  *    final plan (VERDICT r10 directive 6: prove the per-iteration rank
  *    joins leave the checkpointed edge side exchange-free, or find the
  *    surviving exchange).
  *
  * Usage: runMain graft.tools.PlanDumpR11 <outDir> <suffix> [sfDir]
  */
object PlanDumpR11 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    val touched = Seq(
      "t8_unigram_logprob", "t9_tfidf_topterms", "t10_bigram_logprob",
      "t11_pmi_collocations", "dsir1_importance_resample", "t7_repetition_filter")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def write(file: String, text: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, file)
      java.nio.file.Files.writeString(p, text)
      println(s"[plandump] wrote $p")
    }
    touched.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(q) =>
          write(s"${name}_$suffix.txt", q(spark, dir).queryExecution
            .explainString(ExplainMode.fromString("formatted")))
        case None =>
          println(s"[plandump] SKIP $name (not declared at this commit)")
      }
    }

    // IVF assignment stage plan(s) at the sf dial k — via reflection so the
    // same source runs unchanged at the r10 commit (no mode param there)
    val e = graft.core.Tables.embeddings(spark, dir)
    val k = LlmQueries.ivfK(e.count())
    val cents = LlmQueries.ivfCentsAt(spark, e, k)
    val m = LlmQueries.getClass.getMethods
      .filter(_.getName == "ivfCellsAt").head
    if (m.getParameterCount == 4) {
      for (mode <- Seq("flat", "twolevel")) {
        val df = m.invoke(LlmQueries, spark, e, cents, mode)
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        write(s"ivfcells_${mode}_$suffix.txt", df.queryExecution
          .explainString(ExplainMode.fromString("formatted")))
      }
    } else {
      val df = m.invoke(LlmQueries, spark, e, cents)
        .asInstanceOf[org.apache.spark.sql.DataFrame]
      write(s"ivfcells_flat_$suffix.txt", df.queryExecution
        .explainString(ExplainMode.fromString("formatted")))
    }

    // pr1 executed adaptive final plan: the 3 iteration joins + aggs over
    // the checkpointed single-exchange edge build (directive 6 evidence)
    val pr1 = graft.SparkEntry.queries("pr1_pagerank")(spark, dir)
    pr1.queryExecution.toRdd.count() // finalize THIS QE's adaptive plan
    write(s"pr1_iteration_executed_$suffix.txt",
      pr1.queryExecution.executedPlan.toString)

    spark.stop()
  }
}
