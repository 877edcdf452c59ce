package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native product-quantization ADC distance (SURVEY §2.9 escalation path b —
  * a custom Catalyst Expression where the built-ins are the bottleneck; the
  * PQ scheme is Jégou et al., TPAMI 2011).
  *
  * Arguments: (x, cents, tarr) where `x` is ARRAY<FLOAT>, `cents` is
  * ARRAY<ARRAY<FLOAT>> holding the K codebook centroids at full dimension,
  * and `tarr` is the 1-row-precomputed ARRAY<DOUBLE> ADC lookup table laid
  * out tarr[m*K + c] = ‖query_m − ce_c,m‖². Subspace count = len(tarr)/K,
  * subspace dim = len(x)/subspaces. For each subspace m the row's code is
  * the argmin over c of the float→double squared L2 between x's m-th
  * subvector and centroid c's (accumulated LEFT-TO-RIGHT — the exact
  * summation tree of the unrolled SQL both engines run, so near-tie code
  * picks are bit-identical; ties prefer the LOWEST code, matching the
  * `d1<=d2 AND d1<=d3…` CASE chain); the result is Σ_m tarr[m*K+code_m].
  *
  * This replaces a 32-dsq-column + argmin-CASE expression cascade (~256
  * element_at+cast nodes per row) with one primitive loop over the packed
  * float arrays — the pq1 hot path.
  *
  * Contract: x elements non-null (embedding vectors); a null in any
  * argument — OR a null CENTROID element of `cents` (pq1 builds the
  * centroid array from `first(when(vec_id = c, …))` aggregates, which
  * yield null when a centroid row is absent from the table) — propagates
  * null, exactly as the element_at/CASE cascade this expression replaced
  * degraded. */
case class PqAdcDistance(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(FloatType, _), _),
            ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, ARRAY<DOUBLE>), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Can evaluate to null even with non-nullable children (null centroid
  // ELEMENT of `cents`) — without this override nullSafeCodeGen's
  // non-nullable branch interpolates ev.isNull as the literal `false` and
  // the `${ev.isNull} = true;` below emits uncompilable `false = true;`.
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_distance"

  override protected def nullSafeEval(xv: Any, cv: Any, tv: Any): Any = {
    val x = xv.asInstanceOf[ArrayData]
    val cents = cv.asInstanceOf[ArrayData]
    val tarr = tv.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var cc = 0
    while (cc < k) { if (cents.isNullAt(cc)) return null; cc += 1 }
    val nsub = if (k > 0) tarr.numElements() / k else 0
    val sd = if (nsub > 0) x.numElements() / nsub else 0
    var acc = 0.0
    var m = 0
    while (m < nsub) {
      var bestC = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val ce = cents.getArray(c)
        var d = 0.0
        var i = 0
        while (i < sd) {
          val idx = m * sd + i
          val diff = x.getFloat(idx).toDouble - ce.getFloat(idx).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      acc += tarr.getDouble(m * k + bestC)
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cents, tarr) => {
      val k = ctx.freshName("k")
      val nsub = ctx.freshName("nsub")
      val sd = ctx.freshName("sd")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestC = ctx.freshName("bestC")
      val bestD = ctx.freshName("bestD")
      val ce = ctx.freshName("ce")
      val cc = ctx.freshName("cc")
      s"""
         |int $k = $cents.numElements();
         |for (int $cc = 0; $cc < $k; $cc++) {
         |  if ($cents.isNullAt($cc)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  int $nsub = $k > 0 ? $tarr.numElements() / $k : 0;
         |  int $sd = $nsub > 0 ? $x.numElements() / $nsub : 0;
         |  double $acc = 0.0;
         |  for (int $m = 0; $m < $nsub; $m++) {
         |    int $bestC = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $k; $c++) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $ce = $cents.getArray($c);
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $sd; $i++) {
         |        int $idx = $m * $sd + $i;
         |        double $diff = (double) $x.getFloat($idx) - (double) $ce.getFloat($idx);
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |    }
         |    $acc += $tarr.getDouble($m * $k + $bestC);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Companion table builder: the ADC lookup table as ONE native expression.
  *
  * Arguments: (q: ARRAY<FLOAT>, cents: ARRAY<ARRAY<FLOAT>>), `subDim` the
  * subspace width. Output: ARRAY<DOUBLE> of length (len(q)/subDim)·K laid
  * out out[m*K + c] = ‖q_m − ce_c,m‖², each inner sum accumulated
  * LEFT-TO-RIGHT over the subspace dims — the identical summation tree to
  * the unrolled `(q[i]-c[i])*(q[i]-c[i]) + …` SQL the oracle runs, so the
  * values are bit-equal.
  *
  * The point is not row throughput (it runs on a 1-row centroid frame) but
  * PLAN size: the unrolled column form is a ~1,600-node expression tree
  * that Catalyst re-analyzes inside every scalar-subquery reference and
  * Janino compiles per fresh plan — on a 2,000-row table that fixed cost
  * WAS the query (measured ~0.4s of pq1's 1.5s at sf0.1).
  */
case class PqAdcTable(left: Expression, right: Expression, subDim: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) => true
      case _ => false
    }
    if (ok && subDim > 0) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>) and subDim > 0, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}, subDim=$subDim")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // Same null-centroid-element contract as PqAdcDistance: nullable must be
  // forced true or the generated `${ev.isNull} = true;` is `false = true;`
  // under all-non-nullable children.
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_table"

  override protected def nullSafeEval(qv: Any, cv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val cents = cv.asInstanceOf[ArrayData]
    val k = cents.numElements()
    // null centroid element → null result (see PqAdcDistance contract)
    var cc = 0
    while (cc < k) { if (cents.isNullAt(cc)) return null; cc += 1 }
    val nsub = q.numElements() / subDim
    val out = new Array[Double](nsub * k)
    var m = 0
    while (m < nsub) {
      var c = 0
      while (c < k) {
        val ce = cents.getArray(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val idx = m * subDim + i
          val diff = q.getFloat(idx).toDouble - ce.getFloat(idx).toDouble
          d += diff * diff
          i += 1
        }
        out(m * k + c) = d
        c += 1
      }
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cents) => {
      val k = ctx.freshName("k")
      val nsub = ctx.freshName("nsub")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val ce = ctx.freshName("ce")
      val cc = ctx.freshName("cc")
      s"""
         |int $k = $cents.numElements();
         |for (int $cc = 0; $cc < $k; $cc++) {
         |  if ($cents.isNullAt($cc)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  int $nsub = $q.numElements() / $subDim;
         |  double[] $out = new double[$nsub * $k];
         |  for (int $m = 0; $m < $nsub; $m++) {
         |    for (int $c = 0; $c < $k; $c++) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $ce = $cents.getArray($c);
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        int $idx = $m * $subDim + $i;
         |        double $diff = (double) $q.getFloat($idx) - (double) $ce.getFloat($idx);
         |        $d += $diff * $diff;
         |      }
         |      $out[$m * $k + $c] = $d;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
