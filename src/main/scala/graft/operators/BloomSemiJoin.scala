package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtered semi join — the runtime-filter pattern for
  * star joins whose build side is too big to broadcast as a hash relation
  * but whose KEY SET compresses to a few hundred KB of bloom bits.
  *
  * At 100 TB the difference is the whole game: a plain shuffle semi join
  * moves EVERY fact row to the exchange; pushing a bloom probe below the
  * shuffle drops (1 - selectivity) of the fact table at the scan, and only
  * survivors pay shuffle + join cost. Spark's own `InjectRuntimeFilter`
  * does this for eligible equi-joins; this operator is the explicit,
  * composable form (usable mid-pipeline where the rewrite doesn't fire,
  * e.g. above a custom operator output).
  *
  * Build uses Spark's public sketch (`df.stat.bloomFilter` — distributed,
  * mergeable aggregation). The sketch lands on the driver exactly like any
  * runtime-filter subquery result: sketch-sized (fpp-controlled), not
  * data-sized. Probe is a native codegen expression wrapping
  * `mightContainLong` — no UDF boxing, stays inside WholeStageCodegen.
  *
  * Correctness: a bloom probe never yields false NEGATIVES, so
  * prefilter→exact-refine returns exactly the semi-join result; the bloom
  * only thins the refine input.
  */
object BloomSemiJoin {

  /** `fact` rows whose `factKey` is (probably) in the bloom built over
    * `keys(keyCol)` — a superset of the exact semi join at the given fpp.
    * Build and probe BOTH go through a LONG cast: the sketch hashes longs
    * and strings differently, so building over a raw non-long column while
    * probing long would false-negative on every row. */
  def prefilter(fact: DataFrame, factKey: Column, keys: DataFrame,
      keyCol: Column, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val bloom = keys.stat.bloomFilter(keyCol.cast(LongType), expectedItems, fpp)
    fact.filter(GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression(factKey.cast(LongType)), bloom)))
  }

  /** Exact left-semi join with a bloom prefilter pushed below the shuffle:
    * bloom-thin `fact` first, then refine with the real semi join (which
    * de-duplicates and removes bloom false positives). */
  def semiJoin(fact: DataFrame, factKey: Column, keys: DataFrame,
      keyCol: Column, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val thinned = prefilter(fact, factKey, keys, keyCol, expectedItems, fpp)
    // no .distinct() on the keys: a left_semi hash relation dedupes its
    // build side for free — an explicit distinct is a wasted exchange
    thinned.join(keys.select(keyCol.cast(LongType).as("__bsk")),
      factKey.cast(LongType) === col("__bsk"), "left_semi")
  }
}

/** `bloom.mightContainLong(child)` as a Catalyst expression. The filter is
  * a plan-time constant (like a literal sketch), referenced from generated
  * code via `addReferenceObj` — the probe is two hash multiplies and k bit
  * tests, fully inside WholeStageCodegen.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_long"

  override protected def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, key => s"$ref.mightContainLong($key)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
