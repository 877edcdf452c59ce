package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** PERMISSIVE json-lines ingest with corrupt-row quarantine — the messy-
  * feed pattern: schema-conforming rows flow on, malformed lines land in a
  * side channel with their raw text intact for replay/debugging, and the
  * batch NEVER fails on one bad line (FAILFAST) or silently drops it
  * (DROPMALFORMED).
  *
  * Spark requires a persisted frame before filtering on the corrupt-record
  * column alone (the parser would otherwise need a second pass to
  * re-derive raw text); `cache()` here is that documented contract, sized
  * by the input split being read — not a driver collect.
  */
object JsonQuarantine {

  val CorruptCol = "_corrupt_record"

  /** (good rows with `schema`, quarantined raw lines). */
  def read(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, bad)
  }
}
