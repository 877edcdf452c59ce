package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of named queries plus their DuckDB oracle SQL. Every operator
  * module exposes one of these; SparkEntry unions them.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
