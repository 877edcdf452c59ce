package graft.llm

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.similarity.VectorOps

/** Dumps the round-9 IVF cell-assignment plan (fixed k=4 centroids,
  * row_number-window argmax) — the "before" stage plan that the top-level
  * query explains cannot show because ivfCells sits behind an eager
  * memoize/localCheckpoint. The body below is LlmQueries.ivfCells at the
  * round-9 close commit, copied verbatim minus the memoization wrapper.
  * Usage: runMain graft.llm.CellsPlanDumpR9 <outDir> [sfDir]
  */
object CellsPlanDumpR9 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.GraftSession.local()
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val cents = e.filter($"vec_id".between(1, 4))
      .select($"vec_id".cast("long").as("cid"), $"embedding".as("ce"),
        VectorOps.dotNative($"embedding", $"embedding").as("cn2"))
    val w = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cid")
    val cells = e.crossJoin(broadcast(cents))
      .withColumn("ccos", VectorOps.dotNative($"embedding", $"ce") /
        (sqrt(VectorOps.dotNative($"embedding", $"embedding")) * sqrt($"cn2")))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"vec_id", $"cid".as("cell"))
    val p = java.nio.file.Paths.get(outDir, "ivfcells_before.txt")
    java.nio.file.Files.writeString(p,
      cells.queryExecution.explainString(ExplainMode.fromString("formatted")))
    println(s"[stageplan] wrote $p")
    s.stop()
  }
}
