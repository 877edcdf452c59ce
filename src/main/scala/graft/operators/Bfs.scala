package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search levels by iterative frontier
  * expansion — the traversal primitive behind reachability audits
  * ("which documents are within k hops of a trusted seed set") and
  * influence/propagation readouts. Complements the fixpoint family
  * ([[ConnectedComponents]], [[PageRank]], label propagation): BFS is
  * depth-BOUNDED, so the round count is the query parameter, not a
  * convergence property.
  *
  * Each round is one hash-shuffle equijoin of the (materialized-once)
  * edge set against the current frontier plus one left-anti join against
  * the visited set — never anything quadratic, no driver-side graph. Each
  * LEVEL is localCheckpoint'ed once (iterative joins otherwise stack
  * lineage linearly in depth — the [[ConnectedComponents.run]]
  * discipline); the visited set is a plain UNION over those level
  * checkpoints, so no round pays a copy job for it and the live blocks
  * are exactly the result. An empty frontier short-circuits remaining
  * rounds (one O(1) isEmpty job on a checkpointed, frontier-sized frame
  * per round).
  */
object Bfs {

  /** BFS levels over the DIRECTED edge set `edges` (long columns `a` → `b`;
    * callers symmetrize for undirected graphs) from the `sources` node set
    * (long column `v`). Returns (v, level) with level = hop distance
    * (0 for sources), covering exactly the nodes reachable within
    * `maxDepth` hops.
    */
  def levels(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0)
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    var visited = sources.select(col("v")).distinct()
      .withColumn("level", lit(0)).localCheckpoint()
    var frontier = visited.select(col("v"))
    // `visited` is a UNION over the per-level checkpoints, never
    // re-checkpointed: each level's blocks are materialized exactly once
    // and the union plan just reads them, so (a) no per-round copy job for
    // the visited set, and (b) nothing is duplicated in storage — the live
    // blocks ARE the result. Depth is the (small) query parameter, so the
    // union width is bounded. Superseded-block hygiene: only an
    // empty-frontier `next` is garbage (freed immediately); every other
    // checkpoint backs the returned frame.
    var d = 1
    var done = maxDepth == 0
    def free(df: DataFrame): Unit =
      if (df != null) org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(df)
    while (!done) {
      val next = e.join(frontier.withColumnRenamed("v", "a"), "a")
        .select(col("b").as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .withColumn("level", lit(d))
        .localCheckpoint()
      if (next.isEmpty) { free(next); done = true }
      else {
        visited = visited.union(next)
        frontier = next.select(col("v"))
        d += 1
        if (d > maxDepth) done = true
      }
    }
    // the edge checkpoint is not part of the returned plan
    free(e)
    visited
  }
}
