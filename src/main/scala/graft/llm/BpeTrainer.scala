package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextOps

/** BPE tokenizer training over the word-frequency dict (north-star
  * widening; the reference — enterprise_warp — stops at analysis outputs,
  * a tokenizer trainer is the adjacent infrastructure a training-data
  * platform runs).
  *
  * The classic trainer compaction throughout: pair statistics and merges
  * run over the VOCABULARY (dictionary-sized, weighted by word frequency),
  * never over the corpus token stream — at 100 TB the corpus is read once
  * for word counts and every subsequent pass touches |vocab| rows.
  *
  * Merge semantics (shared by the Spark fold, the DuckDB oracle fold and
  * the local reference): greedy left-to-right non-overlapping replacement
  * of the pair (a, b) in the token sequence — " a b a b " → " ab ab ",
  * including consecutive occurrences. The earlier `replace(' a b ',' ab ')`
  * string form silently skipped every second adjacent occurrence (the two
  * matches share a separator space); the left fold below consumes tokens
  * one at a time so adjacent repeats merge correctly, and a token just
  * produced by a merge never re-merges within the same step.
  *
  * Batched training (`trainBatched`): one pair-count job per PASS, then a
  * driver-side greedy selection of mutually text-disjoint merges applied
  * in a single fold — ~30k merges cost ~hundreds of jobs instead of 30k.
  * `strict = true` additionally guarantees bit-equality with sequential
  * training: accepted merges are a PREFIX of the (cnt DESC, a, b) ranking,
  * stopped at the first candidate sharing a symbol with an earlier accept,
  * and filtered to counts strictly above that candidate's. Proof sketch:
  * merging never increases any existing pair's count, a pair created by an
  * accepted merge is bounded by some old pair that shares a symbol with it
  * — and every symbol-sharing pair ranks at or after the stop position. So
  * between accepted merges the sequential argmax is exactly the next
  * accepted candidate. `strict = false` skips conflicting candidates
  * instead of stopping (the standard practical batched-BPE approximation —
  * bigger batches, same greedy-disjoint semantics, no sequential-equality
  * claim).
  */
object BpeTrainer {

  final case class Merge(step: Long, lhs: String, rhs: String,
                         merged: String, pairCount: Long)

  /** Word-frequency dict: (freq, toks) with toks the space-joined character
    * sequence of the word ("hello" → "h e l l o"). One corpus scan. */
  def wordDict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(TextOps.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .withColumn("toks",
        array_join(filter(split($"w", ""), x => x =!= ""), " "))
      .select($"freq", $"toks")
  }

  /** Adjacent-pair counts over the dict, weighted by word frequency. */
  def pairCounts(words: DataFrame): DataFrame = {
    val s = words.sparkSession
    import s.implicits._
    words.select($"freq", split(trim($"toks"), " ").as("t"))
      // single-token words have no pairs — and sequence(1, 0) DESCENDS in
      // Spark, which would send element_at out of bounds under ANSI
      .filter(size($"t") >= 2)
      .select($"freq", explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(element_at(t, i) AS a, element_at(t, i+1) AS b))")).as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(sum($"freq").as("cnt"))
  }

  /** Apply a batch of mutually text-disjoint merges in ONE left fold over
    * the token sequence: the accumulator tracks (output string, last
    * token); when `last + " " + x` is a selected pair the new token is
    * appended without a separator (fusing it onto `last`). Disjointness —
    * enforced by the selection in [[trainBatched]], including the MERGED
    * strings — guarantees a token produced by a merge never matches
    * another pair's lhs, so one fold applies the whole batch with greedy
    * left-to-right semantics per pair.
    */
  def mergeBatch(toks: Column, pairs: Seq[(String, String)]): Column = {
    val keys = typedLit(pairs.map { case (a, b) => a + " " + b })
    val t = split(trim(toks), " ")
    aggregate(
      slice(t, lit(2), size(t) - 1),
      struct(element_at(t, 1).as("out"), element_at(t, 1).as("last")),
      (acc, x) =>
        when(array_contains(keys, concat(acc.getField("last"), lit(" "), x)),
          struct(concat(acc.getField("out"), x).as("out"),
                 concat(acc.getField("last"), x).as("last")))
        .otherwise(
          struct(concat(acc.getField("out"), lit(" "), x).as("out"),
                 x.as("last"))),
      acc => acc.getField("out"))
  }

  /** Batched trainer. Input: a (freq, toks) dict. Returns the merge table
    * (ordered) and the number of passes (pair-count jobs) it took.
    *
    * `warmup`: the first `warmup` merges run at batch size 1 (exact
    * sequential argmax regardless of `strict`) before batching kicks in —
    * the practical config `strict = false, warmup = w` guarantees the
    * first w merges bit-match sequential training while the tail batches
    * aggressively (on natural text the top pairs share symbols, so strict
    * batches degenerate to ~1 accept/pass; relaxed stays wide).
    */
  def trainBatched(wordsIn: DataFrame, n: Int, maxBatch: Int = 128,
                   strict: Boolean = true, warmup: Int = 0): (Vector[Merge], Int) = {
    val s = wordsIn.sparkSession
    import s.implicits._
    var wk = wordsIn.select($"freq", $"toks").localCheckpoint()
    val merges = Vector.newBuilder[Merge]
    var done = 0
    var passes = 0
    var exhausted = false
    while (done < n && !exhausted) {
      passes += 1
      val passBatch = if (done < warmup) 1 else maxBatch
      val passStrict = strict || done < warmup
      val top = pairCounts(wk).orderBy($"cnt".desc, $"a", $"b")
        .limit(passBatch + 1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val acc = Vector.newBuilder[(String, String, Long)]
        var nAcc = 0
        // counts never increase as merges apply, so anything past the
        // collected window is bounded by the (maxBatch+1)-th count
        var bound = if (top.length > passBatch) top(passBatch).getLong(2)
                    else Long.MinValue
        var i = 0
        var halted = false
        while (i < math.min(top.length, passBatch) && !halted && done + nAcc < n) {
          val (a, b, c) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (used(a) || used(b) || used(a + b)) {
            if (passStrict) { bound = math.max(bound, c); halted = true }
            // relaxed mode: skip the conflicting candidate, keep scanning
          } else {
            acc += ((a, b, c)); used ++= Seq(a, b, a + b); nAcc += 1
          }
          i += 1
        }
        val all = acc.result()
        // strict: keep the prefix with counts STRICTLY above the first
        // conflict — a merge-created pair can tie with (never exceed) the
        // conflict count, and a tie could win on text order. The top
        // candidate alone is always the exact argmax, so progress is
        // guaranteed.
        val kept0 = if (passStrict) all.filter(_._3 > bound) else all
        val kept = (if (kept0.isEmpty) all.take(1) else kept0).take(n - done)
        for ((a, b, c) <- kept) {
          done += 1
          merges += Merge(done.toLong, a, b, a + b, c)
        }
        wk = wk.withColumn("toks",
          mergeBatch($"toks", kept.map(p => (p._1, p._2)))).localCheckpoint()
      }
    }
    (merges.result(), passes)
  }

  /** One greedy left-to-right non-overlapping merge of (a, b) over a token
    * sequence — the gold per-merge semantics shared by [[trainLocal]] and
    * [[encode]]. */
  def mergeOne(t: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += t(i); i += 1 }
    }
    out.result()
  }

  /** Tokenizer APPLICATION: encode a word with a trained merge table by
    * replaying the merges in step order — exactly the state the trainer's
    * dict reaches after those merges, so encode(train-corpus word) ≡ the
    * word's final dict entry. O(|merges|·|word|) worst case; in production
    * the per-word result is computed once per VOCABULARY entry and
    * broadcast-joined back to the corpus (bpe4's shape). */
  def encode(w: String, merges: Seq[(String, String)]): Vector[String] = {
    var t = w.split("").filter(_.nonEmpty).toVector
    for ((a, b) <- merges if t.length >= 2) t = mergeOne(t, a, b)
    t
  }

  /** Pure-Scala sequential reference trainer — the gold semantics the
    * batched/strict path must reproduce; used by BpeTrainSpec. */
  def trainLocal(wf: Seq[(String, Long)], n: Int): Vector[Merge] = {
    var words = wf.toVector.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toVector, f)
    }
    val merges = Vector.newBuilder[Merge]
    var step = 0
    var stop = false
    while (step < n && !stop) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((t, f) <- words; i <- 0 until t.length - 1)
        counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), m) => (-m, x, y) }
        step += 1
        merges += Merge(step.toLong, a, b, a + b, c)
        words = words.map { case (t, f) => (mergeOne(t, a, b), f) }
      }
    }
    merges.result()
  }
}
