package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join + salted aggregation for HOT-KEY skew.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on in
  * [[graft.core.GraftSession]]) handles moderate skew by splitting
  * oversized partitions, but it only helps sort-merge joins and cannot
  * split a single key's build-side rows. When one key holds a double-digit
  * percentage of a 100 TB fact table (the null-key / default-value / bot-user
  * pattern), explicit salting is the remaining tool:
  *
  *  - join: the skewed fact side gets a deterministic salt in [0, S) hashed
  *    from its OTHER columns, widening the join key to (key, salt); the
  *    dimension side is replicated S times via a literal salt array +
  *    explode. One hot key now lands on S shuffle partitions instead of 1.
  *    Row multiplicity is exactly preserved (each fact row matches its
  *    dimension row exactly once — on its own salt).
  *  - aggregation: partial-aggregate by (key, salt), final by key. Spark's
  *    hash aggregate already does map-side partials for algebraic
  *    functions; the explicit two-phase form is for size-bounded-state ops
  *    (collect_set / approximate sketches) where ONE reducer would
  *    otherwise hold the hot key's whole state.
  *
  * Salting trades a size-S dimension blow-up for an S-way split of the hot
  * key — pick S ≈ (hot-key share × partition count), a handful not
  * hundreds.
  */
object SaltedJoin {

  /** `hash` of all non-key columns — deterministic (re-runs and retries
    * salt identically; no rand(), which breaks retry idempotency and
    * correctness audits), near-uniform on real data. */
  private def saltExpr(df: DataFrame, key: String, salts: Int): Column = {
    val others = df.columns.filterNot(_ == key).map(col).toSeq
    val h = if (others.isEmpty) col(key) else hash(others: _*)
    pmod(h, lit(salts)).cast("int")
  }

  /** Inner equi-join `facts ⋈ dim` on `key`, salted S ways. `dim` must be
    * join-key-unique (a dimension); facts may be arbitrarily skewed. */
  def join(facts: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", saltExpr(facts, key, salts))
    val saltedDim = dim
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    saltedFacts.join(saltedDim,
        saltedFacts(key) === saltedDim(key) &&
          saltedFacts("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key)).drop("__salt")
  }

  /** Two-phase salted aggregation: `partial` runs per (key, salt) group,
    * `merge` combines the S partials per key. Caller guarantees
    * merge∘partial is the intended decomposition (sum/sum, count/sum,
    * collect_set/flatten-distinct, ...). */
  def agg(df: DataFrame, key: String, salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    df.withColumn("__salt", saltExpr(df, key, salts))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
