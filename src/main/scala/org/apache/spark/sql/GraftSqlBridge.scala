package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surfaces needed to expose custom Catalyst
  * expressions as user-facing Columns (Spark 4 moved Column off the
  * catalyst Expression constructor; `classic.ExpressionUtils` is the
  * sanctioned conversion but is package-private).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a manually built logical plan as a DataFrame (runs the analyzer
    * — `classic.Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the storage blocks of a `localCheckpoint()`ed Dataset NOW.
    *
    * Iterative operators (connected components, BFS, k-core, PageRank)
    * checkpoint each round and drop the reference to the previous round —
    * but the superseded blocks stay in the BlockManager until a full GC
    * lets the ContextCleaner notice the dead RDD. On a long-lived session
    * (a 215-query bench JVM, or a week-old cluster app) that lag
    * accumulates into executor-storage pressure that measurably degrades
    * later queries (bfs1 timed 5.7s late in a bench run vs 1.7s fresh).
    * The loop KNOWS the exact moment a round's blocks become garbage, so
    * it should say so instead of waiting for the GC to guess. No-op for
    * plans that aren't a materialized checkpoint (`LogicalRDD`).
    */
  /** Drain the listener-bus queue (`private[spark]`): measurement tools
    * that read per-task metrics off a SparkListener must settle events
    * between samples or a slow bus bleeds one run's tasks into the next
    * sample's counters. */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  def unpersistCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
