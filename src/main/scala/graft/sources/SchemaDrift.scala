package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift union reader — the 100 TB ingest reality that corpus
  * shards written over months disagree: later shards ADD columns (a new
  * quality score, a new provenance tag) and WIDEN numerics (int32 ids
  * outgrow to int64). A plain `spark.read.parquet(dirs: _*)` either fails
  * the merge or silently drops columns depending on which footer wins;
  * this reader computes the reconciled schema explicitly and makes every
  * shard conform to it, so downstream operators see ONE stable shape.
  *
  * Reconciliation rules (deliberately conservative):
  *  - identical types unify to themselves;
  *  - integral widths widen to the widest (byte/short/int/long → long);
  *  - fractional (and int-vs-fractional) widen to double;
  *  - anything else (string vs long, struct drift) is an ERROR — silent
  *    coercion is how corrupt corpora get trained on.
  *  - columns missing from a shard arrive as typed nulls.
  *
  * Each shard keeps its own pushdown-friendly parquet scan (schemas are
  * applied per-directory, so column pruning and filters still reach each
  * footer); the union is a zero-shuffle plan node.
  */
object SchemaDrift {

  private val integralRank: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
  private val fractional: Set[DataType] = Set(FloatType, DoubleType)

  private[sources] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x, y) if integralRank.contains(x) && integralRank.contains(y) =>
      if (integralRank(x) >= integralRank(y)) x else y
    case (x, y) if (integralRank.contains(x) || fractional(x)) &&
                   (integralRank.contains(y) || fractional(y)) => DoubleType
    case (x, y) =>
      sys.error(s"schema drift is not reconcilable: $x vs $y")
  }

  /** Reconciled schema across shard schemas, preserving first-seen column
    * order (new columns append in discovery order). */
  private[sources] def unify(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    schemas.foreach(_.fields.foreach { f =>
      order(f.name) = order.get(f.name).map(widen(_, f.dataType)).getOrElse(f.dataType)
    })
    StructType(order.map { case (n, t) => StructField(n, t, nullable = true) }.toSeq)
  }

  /** Union the shard directories under the reconciled schema. */
  def readUnion(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, "no shard directories")
    val shards = dirs.map(d => d -> spark.read.parquet(d))
    val target = unify(shards.map(_._2.schema))
    shards.map { case (_, df) =>
      val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(target.fields.map { f =>
        have.get(f.name) match {
          case Some(t) if t == f.dataType => col(f.name)
          case Some(_) => col(f.name).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toSeq: _*)
    }.reduce(_ unionByName _)
  }
}
