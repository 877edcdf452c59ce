package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest of a document corpus with ONLINE near-dup dedup — the
  * continuous-arrival counterpart of the batch dedup pipeline (LlmQueries
  * d3/d6/c1): documents stream in, each row gets a shuffle-free
  * [[graft.text.TextOps.simhashNative]] (the one-pass codegen'd
  * [[graft.functions.SimHash16]] — a pure projection, so the streaming
  * planner accepts it),
  * and `dropDuplicatesWithinWatermark` keeps the FIRST document per simhash
  * with state bounded by the watermark instead of growing with the corpus.
  *
  * Design note for 100 TB ingest: exact-simhash dedup is the streamable
  * fragment of near-dup removal (identical 16-bit sketch ⇒ near-identical
  * doc). Hamming-distance-1 pairing and transitive clustering need
  * cross-row joins over unbounded history — those stay in the periodic
  * batch pass (c1/c2); this filter cheaply drops the bulk of dupes at the
  * door with O(watermark) state.
  */
object CorpusStream {

  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of documents parquet; arrival time
    * is synthesized from doc_id (the fixture corpus has no event time —
    * production ingest would carry its own). */
  def fromDirectory(spark: SparkSession, dir: String): DataFrame =
    withArrival(spark.readStream.schema(rawSchema).parquet(dir))

  def withArrival(docs: DataFrame): DataFrame =
    docs.withColumn("arrived", timestamp_micros(col("doc_id") * 1000000L))

  /** Online near-dup filter: first doc per simhash wins; state expires with
    * the watermark. Identical transform works on a batch frame (parity
    * asserted in the spec via dropDuplicates, the unbounded equivalent). */
  def nearDupDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("simhash",
        graft.text.TextOps.simhashNative(graft.text.TextOps.tokens(col("text"))))
      .withWatermark("arrived", watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Batch (unbounded-history) equivalent: one doc per distinct simhash —
    * the parity target for the spec. */
  def nearDupDedup0(docs: DataFrame): DataFrame =
    docs
      .withColumn("simhash",
        graft.text.TextOps.simhashNative(graft.text.TextOps.tokens(col("text"))))
      .dropDuplicates("simhash")

  /** Streaming quality gate: the gq1 rule family
    * ([[graft.llm.QualityQueries.gqRules]]) evaluated PER ROW with array
    * higher-order functions instead of explode + groupBy — every statistic
    * a document's gate needs comes from its own tokens, so the stateless
    * formulation needs no state store, no watermark, and no shuffle at
    * all: it is one codegen'd projection that runs unchanged on a stream
    * or a batch frame (parity asserted in the spec against gqRules). This
    * is the shape an ingest edge wants at 100 TB/day: gate documents the
    * moment they arrive, not in a nightly batch. */
  def qualityGate(docs: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val stops = array(graft.llm.QualityQueries.Stops.map(lit): _*)
    val nWords = size(toks).cast("long")
    val chars = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), _ + _)
    val nStop = size(filter(toks, t => array_contains(stops, t))).cast("long")
    val nShort = size(filter(toks, t => length(t) <= 2)).cast("long")
    val nSym = size(filter(toks, t => t.rlike("[^a-z]"))).cast("long")
    docs
      .withColumn("n_words", nWords)
      .withColumn("mean_wl", chars.cast("double") / nWords.cast("double"))
      .withColumn("short_frac", nShort.cast("double") / nWords.cast("double"))
      .withColumn("n_stop", nStop)
      .withColumn("n_sym", nSym)
      .withColumn("pass",
        col("n_words").between(30L, 80L) &&
        col("mean_wl").between(4.3, 4.7) &&
        col("n_stop") >= 12L &&
        col("short_frac") <= 0.05 &&
        col("n_sym") === 0L)
      .select(col("doc_id"), col("n_words"), col("mean_wl"),
        col("short_frac"), col("n_stop"), col("n_sym"), col("pass"))
  }
}
