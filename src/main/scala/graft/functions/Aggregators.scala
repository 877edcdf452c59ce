package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY U5): the two aggregation semantics the
  * reference needs that Spark lacks as built-ins, plus the bottom-k sketch
  * a training-data pipeline needs for per-group sampling.
  * All are algebraic (commutative, associative merge) so Spark applies
  * them with map-side partial aggregation — shuffle carries one buffer per
  * group, not the rows.
  */
object Aggregators {

  /** Inverse-variance weighted mean (weightedavg, results.py:276-284):
    * mean = Σ(r/s²)/Σ(1/s²), err = sqrt(1/Σ(1/s²)). IN = (rho, sig). */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), (Double, Double)] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) = {
      val w = 1.0 / (a._2 * a._2)
      (b._1 + a._1 * w, b._2 + w)
    }
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Double)): (Double, Double) =
      (b._1 / b._2, math.sqrt(1.0 / b._2))
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Fixed-range histogram-mode estimator (dist_mode_position,
    * results.py:154-170): nBins equal bins over [lo, hi); mode = left edge
    * of the argmax bin (lowest bin wins ties — np.argmax semantics).
    * The reference derives [lo, hi] from the data; callers do a min/max
    * pass first (see Chain.histogramMode for the two-pass DataFrame form —
    * this Aggregator is the single-pass variant when the range is known).
    */
  class HistMode(nBins: Int, lo: Double, hi: Double)
      extends Aggregator[Double, Array[Long], Double] {
    def zero: Array[Long] = Array.fill(nBins)(0L)
    def reduce(b: Array[Long], v: Double): Array[Long] = {
      // out-of-range values are NOT counted (plt.hist derives bins from the
      // data and never sees them); v == hi lands in the top bin
      if (!v.isNaN && hi > lo && v >= lo && v <= hi) {
        val bin = math.min(math.floor((v - lo) / (hi - lo) * nBins).toInt, nBins - 1)
        b(bin) += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nBins) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Double = {
      var best = 0
      var i = 1
      while (i < nBins) { if (b(i) > b(best)) best = i; i += 1 }
      lo + best.toDouble * (hi - lo) / nBins
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Misra–Gries heavy-hitters sketch (k counters): the frequent-items
    * primitive of corpus analysis (frequent tokens / n-grams / domains).
    * Deterministic guarantee: every item with true frequency > n/(k+1)
    * survives in the key set, yet the buffer never exceeds k entries — a
    * shuffle carries k (key, count) pairs per group regardless of group
    * size, where exact counting shuffles the full key space. reduce is the
    * classic decrement-all step; merge sums counters then subtracts the
    * (k+1)-th largest and drops non-positives (Agarwal et al., "Mergeable
    * Summaries" §5 — guarantee-preserving; merge laws property-tested in
    * AggregatorsSpec). finish returns the sorted surviving key set (the
    * candidate heavy hitters; a second exact pass over candidates is the
    * standard two-pass top-k at scale).
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
    require(k > 0)
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < k => b.updated(v, 1L)
        case None => b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest counter value from everything
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }
    def finish(b: Map[String, Long]): Array[String] = b.keys.toArray.sorted
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Bottom-k sketch (k-minimum-values): keeps the k ids with the smallest
    * deterministic hash priority — simultaneously a uniform per-group
    * SAMPLE (the hash is effectively random but reproducible across runs
    * and retries, unlike rand()) and the KMV distinct-count estimator.
    * Buffer is the id array ordered by (priority, id), never larger than
    * k — a shuffle carries k longs per group regardless of group size,
    * where a window row_number() over the same grouping would sort every
    * row. Merge = merge-by-priority, truncate at k (associative,
    * commutative; property-tested in AggregatorsSpec).
    */
  class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0)
    /** Knuth multiplicative hash, 32-bit — cheap enough to recompute on
      * compare (buffer stays a bare long array) and expressible verbatim
      * in the DuckDB oracle: (id * 2654435761) % 4294967296. */
    @inline private def pri(v: Long): Long = (v * 2654435761L) & 0xFFFFFFFFL
    private def lt(a: Long, b: Long): Boolean = {
      val (pa, pb) = (pri(a), pri(b))
      pa < pb || (pa == pb && a < b)
    }
    def zero: Array[Long] = Array.empty
    def reduce(b: Array[Long], v: Long): Array[Long] =
      if (b.length == k && !lt(v, b(k - 1))) b
      else insert(b, v)
    private def insert(b: Array[Long], v: Long): Array[Long] = {
      var i = b.length
      // ids arrive distinct in the intended use (keys); a duplicate would
      // occupy two slots — guard anyway
      if (b.contains(v)) return b
      val out = new Array[Long](math.min(b.length + 1, k) max b.length)
      java.lang.System.arraycopy(b, 0, out, 0, b.length)
      if (out.length > b.length) out(b.length) = v
      else if (lt(v, out(out.length - 1))) out(out.length - 1) = v
      else return b
      i = out.length - 1
      while (i > 0 && lt(out(i), out(i - 1))) {
        val t = out(i); out(i) = out(i - 1); out(i - 1) = t; i -= 1
      }
      out
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      y.foldLeft(x)(insert)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** K smallest DISTINCT long values per group, as a mergeable aggregate —
    * the posting-list cap of an inverted-index build: the shuffle carries
    * ≤ k longs per term where `slice(sort_array(collect_set(id)), 1, k)`
    * would drag every posting of every term through the shuffle first and
    * sort it after. Buffer = ascending array, capped at k; duplicates
    * ignored (idempotent insert), so pre-distincting the input is a
    * correctness no-op and merely a size optimization. Merge laws
    * property-tested in AggregatorsSpec.
    */
  class MinK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0)
    def zero: Array[Long] = Array.empty
    private def insert(b: Array[Long], v: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, v)
      if (pos >= 0) return b // duplicate
      val ins = -pos - 1
      if (ins >= k) return b // larger than the current k-th smallest
      val n = math.min(b.length + 1, k)
      val out = new Array[Long](n)
      java.lang.System.arraycopy(b, 0, out, 0, ins)
      out(ins) = v
      java.lang.System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
      out
    }
    def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = y.foldLeft(x)(insert)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Top-k rows per group by a long score, as a mergeable aggregate —
    * the shuffle carries ≤ k (score, id) pairs per group, where the
    * equivalent `ROW_NUMBER() OVER (PARTITION BY g ORDER BY score DESC)`
    * window sorts EVERY row of every group. The classic 100 TB "top
    * products per region" shape: map-side partial top-k makes the reduce
    * input proportional to groups×k, not rows.
    *
    * Total order: score DESC, then id ASC (ids must be unique within a
    * group for deterministic results — pack a rowid if needed). Buffer is
    * an interleaved [score0, id0, score1, id1, …] long array kept sorted;
    * merge re-inserts (associative, commutative; property-tested).
    * Output: ids in rank order.
    */
  class TopKByScore(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(k > 0)
    // (score, id) at slot i lives at b(2i), b(2i+1); order: score desc, id asc
    private def before(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    def zero: Array[Long] = Array.empty
    private def insert(b: Array[Long], s: Long, id: Long): Array[Long] = {
      val n = b.length / 2
      if (n == k && !before(s, id, b(2 * k - 2), b(2 * k - 1))) return b
      val m = math.min(n + 1, k)
      val out = new Array[Long](2 * m)
      java.lang.System.arraycopy(b, 0, out, 0, 2 * math.min(n, m))
      out(2 * m - 2) = s; out(2 * m - 1) = id
      var i = m - 1
      while (i > 0 && before(out(2 * i), out(2 * i + 1), out(2 * i - 2), out(2 * i - 1))) {
        val ts = out(2 * i); val ti = out(2 * i + 1)
        out(2 * i) = out(2 * i - 2); out(2 * i + 1) = out(2 * i - 1)
        out(2 * i - 2) = ts; out(2 * i - 1) = ti
        i -= 1
      }
      out
    }
    def reduce(b: Array[Long], v: (Long, Long)): Array[Long] = insert(b, v._1, v._2)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var out = x
      var i = 0
      while (i < y.length) { out = insert(out, y(i), y(i + 1)); i += 2 }
      out
    }
    def finish(b: Array[Long]): Array[Long] =
      Array.tabulate(b.length / 2)(i => b(2 * i + 1))
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** K rows per group with the smallest DOUBLE priority (ties → smaller
    * id), as a mergeable aggregate — the weighted-sampling (Efraimidis–
    * Spirakis A-Res) rank step without a rank window: the shuffle carries
    * ≤ k (priority, id) pairs per group, where `ROW_NUMBER() OVER
    * (PARTITION BY g ORDER BY p)` sorts every row of the group in one
    * task. With ~5 language groups over a 100 TB corpus the window form
    * funnels ~20 TB through a single task; this buffer stays at k entries
    * regardless. Output: ids in rank order (p asc, id asc).
    */
  class BottomKByPriority(k: Int)
      extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Array[Long]] {
    require(k > 0)
    private def before(p1: Double, i1: Long, p2: Double, i2: Long): Boolean =
      p1 < p2 || (p1 == p2 && i1 < i2)
    def zero: (Array[Double], Array[Long]) = (Array.empty, Array.empty)
    private def insert(b: (Array[Double], Array[Long]), p: Double, id: Long):
        (Array[Double], Array[Long]) = {
      val (ps, ids) = b
      val n = ps.length
      if (n == k && !before(p, id, ps(n - 1), ids(n - 1))) return b
      val m = math.min(n + 1, k)
      val op = new Array[Double](m); val oi = new Array[Long](m)
      java.lang.System.arraycopy(ps, 0, op, 0, math.min(n, m))
      java.lang.System.arraycopy(ids, 0, oi, 0, math.min(n, m))
      op(m - 1) = p; oi(m - 1) = id
      var i = m - 1
      while (i > 0 && before(op(i), oi(i), op(i - 1), oi(i - 1))) {
        val tp = op(i); val ti = oi(i)
        op(i) = op(i - 1); oi(i) = oi(i - 1)
        op(i - 1) = tp; oi(i - 1) = ti
        i -= 1
      }
      (op, oi)
    }
    def reduce(b: (Array[Double], Array[Long]), v: (Double, Long)) =
      insert(b, v._1, v._2)
    def merge(x: (Array[Double], Array[Long]), y: (Array[Double], Array[Long])) = {
      var out = x
      var i = 0
      while (i < y._1.length) { out = insert(out, y._1(i), y._2(i)); i += 1 }
      out
    }
    def finish(b: (Array[Double], Array[Long])): Array[Long] = b._2
    def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
      Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** [[BottomKByPriority]] whose FINISH keeps the (priority, id) pairs in
    * rank order — for consumers that need the sort key itself (a k-NN
    * edge's similarity score), not just the ranked ids. Delegates every
    * buffer operation to [[BottomKByPriority]], so the merge laws proven
    * there carry over verbatim; same ≤ k pairs-per-group shuffle bound. */
  class BottomKPairs(k: Int)
      extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Array[(Double, Long)]] {
    private val inner = new BottomKByPriority(k)
    def zero: (Array[Double], Array[Long]) = inner.zero
    def reduce(b: (Array[Double], Array[Long]), v: (Double, Long)) = inner.reduce(b, v)
    def merge(x: (Array[Double], Array[Long]), y: (Array[Double], Array[Long])) =
      inner.merge(x, y)
    def finish(b: (Array[Double], Array[Long])): Array[(Double, Long)] = b._1.zip(b._2)
    def bufferEncoder: Encoder[(Array[Double], Array[Long])] = inner.bufferEncoder
    def outputEncoder: Encoder[Array[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  }

  /** K rows per group with the smallest STRING sort key (ties → smaller
    * id) — the deterministic stratified-sample rank (order by md5(text))
    * as a mergeable aggregate. Same shuffle bound as
    * [[BottomKByPriority]]: ≤ k (key, id) pairs per group ride the
    * shuffle; the stratum never sorts. String compare is Java
    * lexicographic — identical to DuckDB's binary collation on the ASCII
    * hex md5 digest. Output: ids in rank order (key asc, id asc).
    */
  class BottomKByStringKey(k: Int)
      extends Aggregator[(String, Long), (Array[String], Array[Long]), Array[Long]] {
    require(k > 0)
    private def before(k1: String, i1: Long, k2: String, i2: Long): Boolean = {
      val c = k1.compareTo(k2)
      c < 0 || (c == 0 && i1 < i2)
    }
    def zero: (Array[String], Array[Long]) = (Array.empty, Array.empty)
    private def insert(b: (Array[String], Array[Long]), key: String, id: Long):
        (Array[String], Array[Long]) = {
      val (ks, ids) = b
      val n = ks.length
      if (n == k && !before(key, id, ks(n - 1), ids(n - 1))) return b
      val m = math.min(n + 1, k)
      val ok = new Array[String](m); val oi = new Array[Long](m)
      java.lang.System.arraycopy(ks, 0, ok, 0, math.min(n, m))
      java.lang.System.arraycopy(ids, 0, oi, 0, math.min(n, m))
      ok(m - 1) = key; oi(m - 1) = id
      var i = m - 1
      while (i > 0 && before(ok(i), oi(i), ok(i - 1), oi(i - 1))) {
        val tk = ok(i); val ti = oi(i)
        ok(i) = ok(i - 1); oi(i) = oi(i - 1)
        ok(i - 1) = tk; oi(i - 1) = ti
        i -= 1
      }
      (ok, oi)
    }
    def reduce(b: (Array[String], Array[Long]), v: (String, Long)) =
      insert(b, v._1, v._2)
    def merge(x: (Array[String], Array[Long]), y: (Array[String], Array[Long])) = {
      var out = x
      var i = 0
      while (i < y._1.length) { out = insert(out, y._1(i), y._2(i)); i += 1 }
      out
    }
    def finish(b: (Array[String], Array[Long])): Array[Long] = b._2
    def bufferEncoder: Encoder[(Array[String], Array[Long])] =
      Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]](),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): a d×w counter matrix;
    * estimate(x) = min over rows r of M[r][h_r(x) mod w]. Always an
    * OVER-estimate (every occurrence of x lands in all d probed cells);
    * the excess in one row is bounded in expectation by N/w, so
    * min-of-d-rows concentrates sharply. Merge is ELEMENTWISE ADDITION —
    * the sketch of a union is the sum of the sketches — so partial
    * aggregation combines map-side and the shuffle carries d·w longs per
    * group regardless of item cardinality.
    *
    * Row hashes reuse Spark's xxhash64 chain — `hashLong(r, hashLong(x,
    * 42))` — which is exactly what the SQL expression
    * `pmod(xxhash64(x, CAST(r AS BIGINT)), w)` computes, so the PROBE side
    * (reading estimates out of the finished sketch) is plain codegen'd
    * column arithmetic with no UDF: see [[CountMin.estimate]].
    */
  class CountMin(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(d > 0 && w > 0)
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], x: Long): Array[Long] = {
      var r = 0
      while (r < d) { b(r * w + CountMin.index(r, x, w)) += 1; r += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object CountMin {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    /** Cell index of item x in row r — bit-identical to the SQL column
      * expression `pmod(xxhash64(x, CAST(r AS BIGINT)), w)`. */
    def index(r: Int, x: Long, w: Int): Int =
      Math.floorMod(XXH64.hashLong(r.toLong, XXH64.hashLong(x, 42L)), w).toInt
    /** Point estimate from a finished sketch COLUMN: min over rows of the
      * probed cells, as pure column arithmetic (no UDF in the probe path). */
    def estimate(sketch: org.apache.spark.sql.Column,
        item: org.apache.spark.sql.Column, d: Int, w: Int): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions._
      (0 until d).map { r =>
        element_at(sketch,
          (pmod(xxhash64(item, lit(r.toLong)), lit(w.toLong)) + lit(r.toLong * w) + 1)
            .cast("int"))
      }.reduce(least(_, _))
    }
  }

  /** Gram matrix Σ x·xᵀ over an embedding column, as ONE mergeable
    * aggregate — the single-pass reduction behind PCA / whitening /
    * covariance diagnostics at corpus scale. The naive relational route
    * (posexplode to (dim, v) rows, self-join per vec_id) shuffles
    * dim·(dim+1)/2 ≈ 2080 rows PER VECTOR; this buffer carries one
    * dim×dim long array per partition and one merged row total, so the
    * shuffle cost is constant in the corpus size.
    *
    * Inputs are pre-scaled exact integers (`round(v·1e6) as long`, the
    * [[graft.llm.LlmQueries.ev1]] discipline) so sums are
    * order-independent and hash-comparable against the oracle. Range: the
    * per-row product is ≤ (|v|·1e6)² ≈ 3e11 for unit-norm-ish embeddings,
    * so a long cell overflows past ~3e7 rows — at real corpus scale drop
    * the scale to 1e3 (or split hi/lo words); the contract (exact integer
    * sums, elementwise-add merge) is unchanged. Only the upper triangle
    * (i ≤ j) is accumulated; the buffer is laid out as a full dim×dim
    * array so consumers derive (i, j) = (k div dim, k mod dim) with plain
    * integer arithmetic. Merge = elementwise add (associative,
    * commutative; property-tested in AggregatorsSpec).
    */
  class GramMatrix(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(dim > 0)
    def zero: Array[Long] = new Array[Long](dim * dim)
    def reduce(b: Array[Long], sv: Seq[Long]): Array[Long] = {
      require(sv.length == dim, s"expected $dim dims, got ${sv.length}")
      val a = sv.toArray
      var i = 0
      while (i < dim) {
        val ai = a(i)
        var j = i
        while (j < dim) { b(i * dim + j) += ai * a(j); j += 1 }
        i += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
