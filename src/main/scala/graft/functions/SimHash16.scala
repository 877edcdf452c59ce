package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash over an ARRAY<STRING> token column (SURVEY §2.9
  * escalation path b, same motivation as [[DotFloatVectors]]): the
  * declarative form ([[graft.text.TextOps.simhashCol]]) folds the array
  * once PER BIT — 16 HOF traversals with per-element lambda dispatch —
  * while this expression computes all 16 bit-sums in ONE pass with a
  * primitive loop, interpreted and codegen'd identically.
  *
  * Semantics (matches simhashCol, which hashes the array_distinct token
  * set): token priority h = xxhash64(token, seed 42 — Spark's builtin
  * seed); bit j of the result is set iff Σ_{distinct tokens}
  * (((h >>> j) & 1)·2 − 1) > 0. Distinctness here is by HASH value —
  * indistinguishable from by-token outside an xxhash64 collision.
  * Null array → null (NullIntolerant); null elements are skipped.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val seen = new java.util.HashSet[java.lang.Long]()
    val sums = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        if (seen.add(h)) {
          var j = 0
          while (j < 16) { sums(j) += (((h >>> j) & 1L).toInt * 2 - 1); j += 1 }
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) { if (sums(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seen = ctx.addMutableState("java.util.HashSet<Long>", "simhashSeen",
      v => s"$v = new java.util.HashSet<Long>();")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val sums = ctx.freshName("sums")
      val out = ctx.freshName("out")
      s"""
         |$seen.clear();
         |int $n = $a.numElements();
         |int[] $sums = new int[16];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $t = $a.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
         |    if ($seen.add($h)) {
         |      for (int $j = 0; $j < 16; $j++) {
         |        $sums[$j] += ((int) (($h >>> $j) & 1L)) * 2 - 1;
         |      }
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 16; $j++) {
         |  if ($sums[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
