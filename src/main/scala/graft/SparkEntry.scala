package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` is the union of every operator module's declared queries; each
  * key with an `oracleSql` entry is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  private val modules: Seq[graft.core.QueryModule] = Seq(
    graft.relational.Tpch,
    graft.relational.Tpch2,
    graft.analytics.AnalyticsQueries,
    graft.llm.LlmQueries,
    graft.llm.CorpusQueries,
    graft.llm.IndexQueries,
    graft.llm.QualityQueries,
    graft.relational.Extras,
    graft.relational.Temporal,
    graft.relational.GraphQueries,
    graft.sources.TimOracle,
    graft.sources.FixtureOracles,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.relational.Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}
