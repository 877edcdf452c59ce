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
  * the visited set — never anything quadratic, no driver-side graph. The
  * frontier and visited relations are localCheckpoint'ed per round:
  * iterative joins otherwise stack lineage linearly in depth (same
  * discipline as [[ConnectedComponents.run]]). An empty frontier
  * short-circuits remaining rounds (one O(1) isEmpty job on a
  * checkpointed, frontier-sized frame per round).
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
    // the checkpoint backing `frontier` (null on round 1: the initial
    // frontier reads the visited checkpoint, which stays live)
    var frontierSrc: DataFrame = null
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
      // superseded blocks are garbage the moment the dependent checkpoint
      // materializes — release now, don't wait for GC + ContextCleaner
      free(frontierSrc)
      if (next.isEmpty) { free(next); done = true }
      else {
        val grown = visited.union(next).localCheckpoint()
        free(visited)
        visited = grown
        frontier = next.select(col("v"))
        frontierSrc = next
        d += 1
        if (d > maxDepth) done = true
      }
    }
    // `visited` (a checkpoint) is the only frame the caller reads
    free(frontierSrc)
    free(e)
    visited
  }
}
