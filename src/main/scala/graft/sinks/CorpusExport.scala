package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Training-corpus export: the write side of the dedup pipeline.
  *
  * Layout rules for a 100 TB corpus a trainer will re-read many times:
  *  - `partitionBy(lang)` → downstream language-filtered reads prune whole
  *    directories (partition pruning, no file listing of other langs);
  *  - `repartition(lang)` FIRST → each output partition directory is
  *    written by the tasks that own that lang, not by every task — without
  *    it, every one of N tasks opens a file in every lang dir (N×L small
  *    files, the classic partitioned-write explosion);
  *  - `maxRecordsPerFile` bounds the file size so a single giant language
  *    still splits into parallel-readable chunks.
  *
  * For a SKEWED language distribution, replace `repartition(col)` with
  * `repartition(expr(lang, pmod(hash(doc_id), k)))`-style salting so the
  * dominant language writes through k tasks (same trade as
  * operators.SaltedJoin).
  */
object CorpusExport {

  /** `format`: "parquet" (default) or "orc" — both columnar with
    * min/max-stat pruning; the layout rules above apply identically. */
  def write(docs: DataFrame, outDir: String, partitionCol: String = "lang",
      maxRecordsPerFile: Long = 1000000L, format: String = "parquet"): Unit = {
    docs
      .repartition(col(partitionCol))
      .write
      .partitionBy(partitionCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .format(format)
      .save(outDir)
  }

  /** JSONL shard export — the interchange format LLM training stacks
    * consume (one JSON document per line, fixed shard count, optional
    * gzip). Shards are assigned by hash(idCol), so shard sizes stay even
    * under any source skew; the shard COUNT, not file size, is the
    * downstream parallelism contract (a loader maps one reader per shard).
    * Parquet (see [[write]]) stays the analytical format; JSONL is the
    * hand-off format at the pipeline boundary. */
  def writeJsonlShards(docs: DataFrame, outDir: String, idCol: String,
      numShards: Int, gzip: Boolean = false): Unit = {
    val w = docs.repartition(numShards, col(idCol)).write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(outDir)
  }

  /** Range-clustered layout: `repartitionByRange` + `sortWithinPartitions`
    * on `rangeCol` → every output file covers a DISJOINT value range, so a
    * point/range predicate on that column prunes whole files via parquet
    * min/max stats before any row is read — the sorted-layout half of what
    * Z-ordering buys, for the single-column case a doc_id / time axis
    * needs. `numFiles` stands in for cluster parallelism. */
  def writeRangeSorted(docs: DataFrame, outDir: String, rangeCol: String,
      numFiles: Int): Unit = {
    docs
      .repartitionByRange(numFiles, col(rangeCol))
      .sortWithinPartitions(col(rangeCol))
      .write
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Z-ordered layout over TWO dimensions: range-partition + sort by the
    * Morton-interleaved key ([[graft.functions.ZOrder]]), so each file's
    * min/max envelope is tight in BOTH `dimA` and `dimB` — point/range
    * predicates on either column prune files, where a plain sort serves
    * only its leading column. Dims must be pre-quantized to [0, 65535]
    * (the caller owns the value→bucket mapping; stats-driven quantile
    * quantization composes on top). The key is dropped before write. */
  def writeZOrdered(docs: DataFrame, outDir: String, dimA: String,
      dimB: String, numFiles: Int): Unit = {
    docs
      .withColumn("__z", graft.functions.ZOrder.interleave16(col(dimA), col(dimB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Epoch-ordered shard export — the write side of the tm1 manifest
    * ([[graft.llm.CorpusQueries.tm1]]): docs are ranked by the Knuth-hash
    * permutation of `idCol` (deterministic global training order,
    * [[graft.operators.GlobalRank]] — no single-partition window), cut into
    * fixed `shardSize` shards, and written `partitionBy(shard_id)` so each
    * shard is its own directory a loader maps one reader to. The
    * `repartition(shard_id)` BEFORE the partitioned write keeps each shard
    * directory single-writer (no tasks×shards small-file explosion), and
    * `sortWithinPartitions(rank)` makes the within-shard row order — the
    * order the trainer consumes — byte-deterministic. Returns the written
    * doc count.
    */
  def writeOrderedShards(docs: DataFrame, outDir: String, idCol: String,
      shardSize: Long): Long = {
    val keyed = docs.withColumn("__h",
      graft.operators.GlobalRank.knuthHash(col(idCol)))
    val ranked = graft.operators.GlobalRank
      .withRowNumber(keyed, Seq(col("__h"), col(idCol)), rn = "__rank",
        nTotal = None)
      .withColumn("shard_id", expr(s"(__rank - 1) div $shardSize"))
    ranked
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("__rank"))
      .drop("__h")
      .write
      .partitionBy("shard_id")
      .mode("overwrite")
      .parquet(outDir)
    docs.sparkSession.read.parquet(outDir).count()
  }
}
