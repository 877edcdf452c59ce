package graft.core

import org.apache.spark.sql.SparkSession

/** Uniform SparkSession construction for every entry point (Verify, Bench,
  * tests). Single place for the configs that affect result correctness:
  *
  *  - `spark.sql.session.timeZone=UTC` — oracle (DuckDB) parity for any
  *    timestamp arithmetic.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — the driver's `events`
  *    table stores TIMESTAMP(NANOS) which Spark 4 otherwise rejects
  *    ([PARQUET_TYPE_ILLEGAL]); we read it as a long and convert in
  *    [[Tables.events]].
  *  - shuffle partitions sized for the local run, not the 200 default;
  *    AQE on so real clusters re-plan at runtime (skew joins, coalesced
  *    shuffle reads) — the 100 TB posture is: declare the plan, let AQE
  *    right-size it.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // Catalyst extension point: injected SQL functions (dot_f32,
      // cosine_f32) + the HOF-dot→native-Expression optimizer rule.
      .withExtensions(new graft.ext.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // default 100-entry codegen cache thrashes across a 50+-query suite
      // (~300 generated classes) → constant Janino recompilation showing
      // up as multi-second stalls on random queries (static conf: must be
      // set before the session exists)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session with `n` threads (defaults to env SPARK_GRAFT_CPUS). */
  def local(n: Int = cpus): SparkSession = {
    val s = builder(s"local[$n]", math.max(4, n)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Iterative operators deliberately unpersist superseded localCheckpoint
    // RDDs (GraftSqlBridge.unpersistCheckpoint) — Spark WARNs once per
    // release that truncated lineage cannot be recomputed, which is the
    // point (the blocks are verified-dead rounds); hundreds of those lines
    // per bench run drown real warnings, so the RDD loggers go to ERROR.
    Seq("org.apache.spark.rdd.MapPartitionsRDD", "org.apache.spark.rdd.RDD",
        "org.apache.spark.rdd.ParallelCollectionRDD")
      .foreach(l => org.apache.logging.log4j.core.config.Configurator
        .setLevel(l, org.apache.logging.log4j.Level.ERROR))
    s
  }

  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
}
