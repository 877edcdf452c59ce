package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

class PqAdcSpec extends SparkTestBase {

  private def adcTable(q: Column, cents: Column, subDim: Int): Column =
    GraftSqlBridge.column(PqAdcTable(
      GraftSqlBridge.expression(q), GraftSqlBridge.expression(cents), subDim))
  private def adcDist(x: Column, cents: Column, tarr: Column): Column =
    GraftSqlBridge.column(PqAdcDistance(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(cents),
      GraftSqlBridge.expression(tarr)))

  // 4-dim vectors, 2 subspaces of width 2, 2 centroids — small enough to
  // hand-compute every table slot and code.
  private val q = Seq(0.0f, 0.0f, 1.0f, 1.0f)
  private val c0 = Seq(1.0f, 0.0f, 1.0f, 0.0f)
  private val c1 = Seq(0.0f, 2.0f, 1.0f, 1.0f)

  test("PqAdcTable lays out ‖q_m − c_{c,m}‖² as [m*K + c]") {
    import spark.implicits._
    val df = Seq((q, Seq(c0, c1))).toDF("q", "cents")
      .select(adcTable($"q", $"cents", 2).as("t"))
    val t = df.head().getSeq[Double](0)
    // m=0: q=(0,0); c0=(1,0) → 1; c1=(0,2) → 4
    // m=1: q=(1,1); c0=(1,0) → 1; c1=(1,1) → 0
    assert(t === Seq(1.0, 4.0, 1.0, 0.0))
  }

  test("PqAdcDistance encodes per-subspace argmin and sums table lookups") {
    import spark.implicits._
    // x: subspace 0 = (1,0) → nearest c0 (d=0 vs c1 d=5) → t[0]=1
    //    subspace 1 = (0,1) → nearest c1 (d=1 vs c0 d=2... c0=(1,0): (1-0)²+(0-1)²=2; c1=(1,1): 1) → t[3]=0
    val x = Seq(1.0f, 0.0f, 0.0f, 1.0f)
    val df = Seq((x, q, Seq(c0, c1))).toDF("x", "q", "cents")
      .withColumn("tarr", adcTable($"q", $"cents", 2))
      .select(adcDist($"x", $"cents", $"tarr").as("d"))
    assert(df.head().getDouble(0) === 1.0 + 0.0)
  }

  test("ties prefer the lowest code (matches the d1<=d2<=… CASE chain)") {
    import spark.implicits._
    // x equidistant from both centroids in subspace 0: picks c0 → t[0]
    val cA = Seq(1.0f, 0.0f)
    val cB = Seq(-1.0f, 0.0f)
    val x = Seq(0.0f, 0.0f)
    val qq = Seq(3.0f, 0.0f) // t = [(3-1)²=4, (3+1)²=16]
    val df = Seq((x, qq, Seq(cA, cB))).toDF("x", "q", "cents")
      .withColumn("tarr", adcTable($"q", $"cents", 2))
      .select(adcDist($"x", $"cents", $"tarr").as("d"))
    assert(df.head().getDouble(0) === 4.0)
  }

  test("matches the unrolled column cascade bit-for-bit on real embeddings") {
    import spark.implicits._
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def dsq(x: Column, c: Column, m: Int): Column =
      (0 until 8).map { i =>
        val idx = m * 8 + i + 1
        val d = element_at(x, idx).cast("double") - element_at(c, idx).cast("double")
        d * d
      }.reduce(_ + _)
    val cents0 = e.filter($"vec_id" <= 4).agg(
      first(when($"vec_id" === 0, $"embedding"), ignoreNulls = true).as("qe"),
      (1 to 4).map(c =>
        first(when($"vec_id" === c, $"embedding"), ignoreNulls = true).as(s"ce$c")): _*)
    val cents = cents0
      .withColumn("cearr", array(col("ce1"), col("ce2"), col("ce3"), col("ce4")))
      .withColumn("tarr", adcTable(col("qe"), col("cearr"), 8))
    val base = graft.core.ScalarSub.withScalars(e.filter($"vec_id" =!= 0), cents)
    // the r6 unrolled form: staged d columns + CASE argmin + CASE lookup
    val withD = (for { m <- 0 until 8; c <- 1 to 4 } yield (m, c))
      .foldLeft(base) { case (df, (m, c)) =>
        df.withColumn(s"d_${m}_$c", dsq($"embedding", col(s"ce$c"), m)) }
    val withCodes = (0 until 8).foldLeft(withD) { (df, m) =>
      def d(c: Int) = col(s"d_${m}_$c")
      df.withColumn(s"code_$m",
        when(d(1) <= d(2) && d(1) <= d(3) && d(1) <= d(4), 1)
          .when(d(2) <= d(3) && d(2) <= d(4), 2)
          .when(d(3) <= d(4), 3).otherwise(4))
    }
    val cascade = (0 until 8).map { m =>
      element_at($"tarr", col(s"code_$m") + lit(m * 4))
    }.reduce(_ + _)
    val both = withCodes.select(
      cascade.as("old"),
      adcDist($"embedding", $"cearr", $"tarr").as("native"))
    assert(both.filter($"old" =!= $"native").count() === 0)
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Float]], Seq(c0, c1)))
      .toDF("x", "cents")
      .withColumn("tarr", adcTable(lit(null).cast("array<float>"), $"cents", 2))
      .select(adcDist($"x", $"cents", typedLit(Seq(1.0, 2.0, 3.0, 4.0))).as("d"),
        $"tarr")
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null CENTROID element propagates null instead of crashing") {
    // pq1 builds cents via array(first(when(vec_id = c, …))…): an absent
    // centroid row yields a null ELEMENT, which the replaced element_at/
    // CASE cascade null-propagated — the native expressions must degrade
    // the same way, in both interpreted eval and codegen
    import spark.implicits._
    val df = Seq((q, Seq(c0, null))).toDF("x", "cents")
      .select(adcTable($"x", $"cents", 2).as("t"),
        adcDist($"x", $"cents", typedLit(Seq(1.0, 2.0, 3.0, 4.0))).as("d"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    // interpreted path too (LocalTableScan can still constant-fold; force
    // eval directly)
    val centsWithNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(
        c0.toArray[Any]), null))
    val xa = new org.apache.spark.sql.catalyst.util.GenericArrayData(q.toArray[Any])
    val ta = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1.0, 2.0, 3.0, 4.0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val centsT = ArrayType(ArrayType(FloatType), containsNull = true)
    assert(PqAdcTable(Literal(xa, ArrayType(FloatType)),
      Literal(centsWithNull, centsT), 2).eval(null) == null)
    assert(PqAdcDistance(Literal(xa, ArrayType(FloatType)),
      Literal(centsWithNull, centsT),
      Literal(ta, ArrayType(DoubleType))).eval(null) == null)
  }

  test("non-nullable children still compile under codegen (nullable override)") {
    // With all-non-nullable children and no `nullable=true` override,
    // nullSafeCodeGen takes its non-nullable branch where ev.isNull is the
    // LITERAL `false` — the null-centroid guard's `${ev.isNull} = true;`
    // then emits uncompilable `false = true;`. fallback=false makes that a
    // hard failure instead of a silent interpreted retry.
    import spark.implicits._
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val nn = coalesce($"embedding", typedLit(Seq.fill(64)(0.0f))) // nullable=false
    val cents = array(nn, nn)
    val tarr = coalesce(adcTable(nn, cents, 8), typedLit(Seq.fill(16)(0.0)))
    val df = e.select(adcDist(nn, cents, tarr).as("d"))
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(df.filter($"d" =!= 0.0).count() === 0) // every row vs itself → 0
      assert(df.queryExecution.executedPlan.toString.contains("*("))
      assert(df.schema("d").nullable) // schema must admit the null-centroid case
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("participates in whole-stage codegen (no fallback)") {
    import spark.implicits._
    // parquet-backed source (a LocalTableScan never enters codegen)
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = e.select(
      adcDist($"embedding",
        array($"embedding", $"embedding"),
        adcTable($"embedding", array($"embedding", $"embedding"), 8)).as("d"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }
}
