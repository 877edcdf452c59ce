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
}
