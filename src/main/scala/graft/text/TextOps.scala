package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, token dictionaries, MinHash signatures, SimHash, shingles,
  * quality metrics, fingerprints.
  *
  * Two token-id routes:
  *  - [[tokenDict]]: dense ids by global sorted `row_number` — exactly
  *    reproducible cross-engine (used by the oracle-checked queries). The
  *    global window is a deliberate small-vocab choice.
  *  - [[hashTokenId]]: `xxhash64` — the 100 TB route, no global state, no
  *    shuffle for the dictionary; identical pipeline shape downstream.
  */
object TextOps {

  /** Whitespace tokens, empties dropped (mirrors `string_split` + filter). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** (doc_id, pos, tok) exploded token stream; pos is 1-based. `keep`
    * passes doc-level columns (e.g. lang) through the explode, so
    * downstream grouping by metadata needs no join back to the corpus. */
  def docTokens(docs: DataFrame, docId: Column, text: Column,
      keep: Seq[Column] = Nil): DataFrame =
    docs.select((docId.as("doc_id") +: keep) :+
        posexplode(tokens(text)).as(Seq("pos0", "tok")): _*)
      .withColumn("pos", col("pos0") + 1).drop("pos0")

  /** Global token dictionary (tok, tid), tid = 1-based rank in sorted order
    * (distributed ranking via [[graft.operators.GlobalRank]] — no
    * single-partition window even for billion-token vocabularies). */
  def tokenDict(toks: DataFrame): DataFrame =
    graft.operators.GlobalRank.withRowNumber(
      toks.select(col("tok")).distinct(), Seq(col("tok")), rn = "tid", nTotal = None)

  /** Scale-path token id: stable 64-bit hash, no global ordering needed. */
  def hashTokenId(tok: Column): Column = xxhash64(tok)

  val MinhashPrime = 1000003L
  /** (a, b) parameters of the 8 universal hash functions h_i(t) = (a·t+b) mod P. */
  val MinhashParams: Seq[(Long, Long)] =
    Seq((7L, 3L), (11L, 5L), (13L, 7L), (17L, 11L), (19L, 13L), (23L, 17L), (29L, 19L), (31L, 23L))

  /** MinHash signature columns mh0..mh7 for a (doc_id, tid) stream. */
  def minhashSignatures(docTids: DataFrame): DataFrame = {
    val aggs = MinhashParams.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("tid") + lit(b)) % MinhashPrime).as(s"mh$i")
    }
    docTids.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys: 4 bands × 2 rows over the 8-minhash signature.
    * Returns (doc_id, band) with band = "i:mh_{2i}_mh_{2i+1}". */
  def lshBands(sig: DataFrame): DataFrame = {
    val bandCols = (0 until 4).map { i =>
      concat_ws(":", lit(i), concat_ws("_", col(s"mh${2 * i}"), col(s"mh${2 * i + 1}")))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
  }

  /** 16-bit SimHash from token ids: bit j set iff
    * Σ_tokens (((tid·2654435761) >> j) & 1)·2−1 > 0. Works on the distinct
    * token set (set semantics, like minhash). */
  def simhash(docTids: DataFrame, bits: Int = 16): DataFrame = {
    val x = col("tid") * lit(2654435761L)
    val sums = (0 until bits).map { j =>
      sum(shiftright(x, j).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$j")
    }
    val agg = docTids.select(col("doc_id"), col("tid")).distinct()
      .groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val hash = (0 until bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), hash.as("simhash"))
  }

  /** Mixer constants for the 4×16-bit chunked simhash: h_c(t) =
    * (t·a_c + b_c) mod (2^20 − 3). Products stay < 2^63 for any realistic
    * vocab id, so the SAME arithmetic runs overflow-free in DuckDB BIGINT
    * (which errors on wrap) — cross-engine bit-exactness by construction. */
  val ChunkPrime = 1048573L // 2^20 − 3, prime
  val ChunkParams: Seq[(Long, Long)] =
    Seq((2654435761L, 3L), (2246822519L, 5L), (3266489917L, 7L), (668265263L, 11L))

  /** Eight mixers for the 128-bit variant (d6b): the first four are
    * [[ChunkParams]] — so chunks sh0..sh3 of the 128-bit hash ARE the
    * 64-bit hash — plus four more public avalanche constants. Still
    * t·a + b < 2^63 for any vocabulary-sized tid. */
  val ChunkParams8: Seq[(Long, Long)] = ChunkParams ++
    Seq((374761393L, 13L), (3432918353L, 17L), (461845907L, 19L), (2246822507L, 23L))

  /** 64-bit SimHash as four independent 16-bit chunks sh0..sh3 — the
    * scale-correct near-dup representation. A single 16-bit hash collides
    * on 8-bit bands at rate n²/256 (measured superlinear at the sf1 probe);
    * four 16-bit chunks banded whole give pigeonhole-exact recall for
    * hamming ≤ 3 over the virtual 64-bit hash with random-collision rate
    * n²/65536 per band. Same ±1 bit-vote rule as [[simhash]], over the
    * distinct token set. */
  def simhashChunks(docTids: DataFrame,
      params: Seq[(Long, Long)] = ChunkParams): DataFrame = {
    val sums = params.zipWithIndex.flatMap { case ((a, b), c) =>
      val h = (col("tid") * lit(a) + lit(b)) % lit(ChunkPrime)
      (0 until 16).map { j =>
        sum(shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1).as(s"s${c}_$j")
      }
    }
    val agg = docTids.select(col("doc_id"), col("tid")).distinct()
      .groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val chunks = params.indices.map { c =>
      (0 until 16).map { j =>
        when(col(s"s${c}_$j") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"sh$c")
    }
    agg.select(col("doc_id") +: chunks: _*)
  }

  /** Token 3-gram shingles as an array column (docs with <3 tokens excluded
    * by the caller). 1-based `element_at`. */
  def shingles3(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 2), i =>
      concat_ws("_", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))

  /** Positional polynomial fingerprint: Σ (tid+7)·pos² mod P — an
    * order-sensitive document fingerprint (rolling-hash family). */
  def fingerprint(docTids: DataFrame): DataFrame =
    docTids.groupBy(col("doc_id"))
      .agg((sum((col("tid") + 7) * col("pos") * col("pos")) % MinhashPrime).as("fp"))

  /** ROW-LOCAL 16-bit SimHash over a token array: xxhash64 token ids
    * (the shuffle-free dictionary route) folded per row with HOF
    * `aggregate` — no groupBy, no shuffle, so it runs identically in a
    * streaming plan (see streaming.CorpusStream) and inside any projection.
    * Same bit rule as [[simhash]]: bit j set iff the ±1 sum of token bit j
    * is positive, over the DISTINCT token set. */
  def simhashCol(toks: Column, bits: Int = 16): Column = {
    val uniq = array_distinct(toks)
    val hash = (0 until bits).map { j =>
      val s = aggregate(uniq, lit(0L), (acc, t) =>
        acc + (shiftright(xxhash64(t), j).bitwiseAND(lit(1L)) * 2 - 1))
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    hash
  }

  /** [[simhashCol]] as the native one-pass expression
    * ([[graft.functions.SimHash16]]): all 16 bit-sums in a single codegen'd
    * loop instead of 16 HOF array traversals. Same results (parity spec). */
  def simhashNative(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.SimHash16(GraftSqlBridge.expression(toks)))
  }
}
