package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** End-to-end training-corpus curation: the individual operators
  * (repetition filter, unigram-LM quality score, near-dup clustering,
  * eval-set decontamination) composed into the single pass a 100 TB
  * pipeline runs before training, plus the sharded hand-off export.
  *
  * Composition is entirely semi/anti joins on doc_id against the stage
  * verdict tables — each stage stays an independent, separately tested
  * operator (LlmQueries.t7/t8/c2/d7), and the shared tokenization
  * intermediates are memoized so the corpus is tokenized once, not once
  * per stage. Stage order is cheapest-reduction-first only in REPORTING;
  * the plan itself is one DAG and Catalyst schedules the joins.
  */
object Curation {

  /** Per-stage keep/drop accounting: (stage, dropped, remaining). */
  case class StageReport(stage: String, dropped: Long, remaining: Long)

  /** doc_ids failing the repetition rules (LlmQueries.t7 keep=false). */
  def repetitionDrops(s: SparkSession, dir: String): DataFrame =
    LlmQueries.t7(s, dir).filter(!col("keep")).select("doc_id")

  /** doc_ids failing the unigram-LM quality score (t8 keep=false). */
  def qualityDrops(s: SparkSession, dir: String): DataFrame =
    LlmQueries.t8(s, dir).filter(!col("keep")).select("doc_id")

  /** doc_ids losing to their near-dup cluster keeper (c2 drop list). */
  def nearDupDrops(s: SparkSession, dir: String): DataFrame =
    LlmQueries.c2(s, dir).select("doc_id")

  /** doc_ids sharing too many shingles with the eval set (d7, ≥ minFrac
    * contaminated shingles). */
  def contaminationDrops(s: SparkSession, dir: String, minFrac: Double = 0.5): DataFrame =
    LlmQueries.d7(s, dir).filter(col("contam_frac") >= minFrac).select("doc_id")

  /** The held-out eval documents themselves (d7's doc_id % 10 = 0
    * convention) — they must NEVER reach the training export: d7 only
    * scores TRAIN docs against them, so without this stage every eval doc
    * would sail through the other filters into the hand-off, the exact
    * leak decontamination exists to prevent. */
  def evalHoldoutDrops(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id").filter(col("doc_id") % 10 === 0)

  private def stageDrops(s: SparkSession, dir: String,
      minContamFrac: Double): Seq[(String, DataFrame)] = Seq(
    "eval_holdout" -> evalHoldoutDrops(s, dir),
    "repetition" -> repetitionDrops(s, dir),
    "lm_quality" -> qualityDrops(s, dir),
    "near_dup" -> nearDupDrops(s, dir),
    "decontamination" -> contaminationDrops(s, dir, minContamFrac))

  /** The kept corpus after all five stages (anti joins on doc_id). */
  def curate(s: SparkSession, dir: String, minContamFrac: Double = 0.5): DataFrame =
    stageDrops(s, dir, minContamFrac)
      .foldLeft(Tables.documents(s, dir)) { case (d, (_, drops)) =>
        d.join(drops, Seq("doc_id"), "left_anti")
      }

  /** Stage-by-stage accounting, sequential semantics (a doc dropped by an
    * earlier stage is not double-counted by a later one). */
  def report(s: SparkSession, dir: String, minContamFrac: Double = 0.5): Seq[StageReport] = {
    var current = Tables.documents(s, dir).select("doc_id")
    var remaining = current.count()
    stageDrops(s, dir, minContamFrac).map { case (name, drops) =>
      val next = current.join(drops, Seq("doc_id"), "left_anti")
      // thread the previous stage's count through — one action per stage,
      // never recounting the frame just counted
      val after = next.count()
      val r = StageReport(name, remaining - after, after)
      current = next
      remaining = after
      r
    }
  }

  /** Curate then export as hash-sharded JSONL (the training hand-off);
    * returns the exported row count (read from the written shards — the
    * curation DAG executes exactly once, for the write). */
  def curateAndExport(s: SparkSession, dir: String, outDir: String,
      numShards: Int = 16, minContamFrac: Double = 0.5): Long = {
    val kept = curate(s, dir, minContamFrac)
    graft.sinks.CorpusExport.writeJsonlShards(kept, outDir, "doc_id", numShards)
    s.read.json(outDir).count()
  }

  /** The full dataset RELEASE: curate, lay the survivors out as
    * rank-ordered training shards on disk
    * ([[graft.sinks.CorpusExport.writeOrderedShards]]), and return the
    * release manifest — per shard: doc/token counts, rank span, first/last
    * doc, and the order-sensitive content digest
    * ([[CorpusQueries.manifest]], the tm1 + mf1 shapes over the CURATED
    * corpus). Equal manifests across re-runs prove a byte-identical
    * release end to end — digest included — without re-reading the shards.
    * The curated frame is localCheckpoint'ed so the five-stage curation
    * DAG executes once for both the write and the manifest. */
  def curateToTrainingShards(s: SparkSession, dir: String, outDir: String,
      shardSize: Long = 64L, minContamFrac: Double = 0.5): DataFrame = {
    val kept = curate(s, dir, minContamFrac).localCheckpoint()
    graft.sinks.CorpusExport.writeOrderedShards(kept, outDir, "doc_id", shardSize)
    CorpusQueries.manifest(kept, shardSize)
  }
}
