package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, struct}

/** Scalar-subquery plumbing for 1-row stats frames (VERDICT r5
  * directive 9).
  *
  * The historical pattern `fact.crossJoin(broadcast(oneRowStats))` is
  * semantically a scalar broadcast but PLANS as a
  * BroadcastNestedLoopJoin — indistinguishable, in a plan audit, from an
  * accidental cartesian, which forced a 43-entry allowlist in the
  * whole-inventory sweep. Spark 4's `Dataset.scalar()` plans the same
  * thing as a ScalarSubquery expression instead: the 1-row aggregate runs
  * once as a subquery stage, its result is inlined as a literal into the
  * main plan (codegen'd, no join node, no shuffle), and identical
  * subqueries are deduplicated by ReuseSubquery/MergeScalarSubqueries.
  * Same asymptotic cost, strictly cleaner plan — and the cartesian sweep
  * needs no exception for it.
  *
  * Measured trade-off at local[32]: the subquery runs as its own job, so
  * SUB-SECOND queries pay one extra ~0.05-0.15s scheduling floor vs the
  * old in-job crossJoin (r5→r6 bench: converted queries 1.68x vs a 1.4x
  * same-host control drift ⇒ ~1.2x attributable). A constant, not a
  * slope: at cluster scale the floor amortizes to nothing and the
  * subquery result is computed once and reused, while a
  * BroadcastNestedLoopJoin node invites the planner (and the auditor) to
  * treat the query as cartesian-shaped.
  */
object ScalarSub {

  /** The 1-row frame as a single struct-valued scalar subquery Column.
    * Struct-wrapping keeps it ONE subquery regardless of how many fields
    * the consumer reads. */
  def scalarStruct(one: DataFrame): Column =
    one.select(struct(one.columns.map(col).toIndexedSeq: _*).as("s")).scalar()

  /** Drop-in replacement for `x.crossJoin(broadcast(one))` where `one` is
    * a 1-row frame: every column of `one` becomes a scalar-subquery field
    * on `x`, so downstream column references are unchanged.
    *
    * Semantics note: call sites are either global aggregates (exactly one
    * row, where crossJoin and subquery coincide) or filter-to-one-row
    * frames whose single-row invariant is data-guaranteed (e.g. the
    * `vec_id === 0` query vector): there, ZERO rows yields null-propagated
    * fields where the crossJoin emptied `x`, and >1 rows is a runtime
    * "more than one row returned by a subquery" error where the crossJoin
    * multiplied rows — both are louder failures than silent multiplication,
    * which is the intended behavior.
    *
    * Name-collision guard: `withColumn` REPLACES an existing column of the
    * same name, which would silently corrupt `x` where the old crossJoin
    * surfaced an ambiguous-reference error — so collisions are rejected. */
  def withScalars(x: DataFrame, one: DataFrame): DataFrame = {
    val clash = one.columns.toSet.intersect(x.columns.toSet)
    require(clash.isEmpty,
      s"withScalars column collision (would silently replace): ${clash.mkString(", ")}")
    val s = scalarStruct(one)
    one.columns.foldLeft(x)((acc, c) => acc.withColumn(c, s.getField(c)))
  }
}
