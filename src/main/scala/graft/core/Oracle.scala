package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers that make floating-point aggregates hash-comparable against the
  * DuckDB oracle.
  *
  * The driver compares results by value hash, so "equal up to float noise"
  * is not enough — sums must be bit-identical. Doubles summed in different
  * orders (Spark partial aggregation vs DuckDB sequential) differ in the
  * last ulps, so every monetary aggregate goes through exact decimal
  * arithmetic with EXPLICIT intermediate types (mirrored verbatim in the
  * oracle SQL), and only the final value is cast back to double.
  *
  * Source data discipline (TESTDATA.md): prices have 2 decimal digits
  * (< 1e6), discount/tax have 2 decimal digits in [0,1], quantities are
  * small integers stored as doubles.
  */
object Oracle {

  /** Price-like column → DECIMAL(12,2) (exact for values < 1e10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Rate-like column (discount, tax) → DECIMAL(4,2). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Quantity-like column → DECIMAL(12,2). */
  def qty(c: Column): Column = c.cast(DecimalType(12, 2))

  /** `1 - rate` as DECIMAL(5,2); SQL: (CAST(1 AS DECIMAL(4,2)) - CAST(x AS DECIMAL(4,2))) */
  def oneMinus(c: Column): Column =
    (lit(1).cast(DecimalType(4, 2)) - rate(c)).cast(DecimalType(5, 2))

  /** `1 + rate` as DECIMAL(5,2). */
  def onePlus(c: Column): Column =
    (lit(1).cast(DecimalType(4, 2)) + rate(c)).cast(DecimalType(5, 2))

  /** `price * (1 - discount)` as DECIMAL(18,4) — the TPC-H revenue term. */
  def revenueTerm(price: Column, discount: Column): Column =
    (money(price) * oneMinus(discount)).cast(DecimalType(18, 4))

  /** `price * (1 - discount) * (1 + tax)` as DECIMAL(24,6). */
  def chargeTerm(price: Column, discount: Column, tax: Column): Column =
    (revenueTerm(price, discount) * onePlus(tax)).cast(DecimalType(24, 6))

  /** Final cast of an exact decimal aggregate back to double. */
  def d(c: Column): Column = c.cast(DoubleType)

  /** Exact-decimal-sum average, emitted as double: double(sum)/count.
    * Numerator and denominator are exact on both engines, so the IEEE
    * division result is bit-identical.
    */
  def avgExact(sumDec: Column, count: Column): Column =
    d(sumDec) / count.cast(DoubleType)

  // ---- SQL-side fragments (keep in lockstep with the Column versions) ----
  val sqlMoney: String => String = c => s"CAST($c AS DECIMAL(12,2))"
  val sqlRate: String => String  = c => s"CAST($c AS DECIMAL(4,2))"
  val sqlOneMinus: String => String =
    c => s"CAST((CAST(1 AS DECIMAL(4,2)) - ${sqlRate(c)}) AS DECIMAL(5,2))"
  val sqlOnePlus: String => String =
    c => s"CAST((CAST(1 AS DECIMAL(4,2)) + ${sqlRate(c)}) AS DECIMAL(5,2))"
  def sqlRevenueTerm(price: String, disc: String): String =
    s"CAST(${sqlMoney(price)} * ${sqlOneMinus(disc)} AS DECIMAL(18,4))"
  def sqlChargeTerm(price: String, disc: String, tax: String): String =
    s"CAST(${sqlRevenueTerm(price, disc)} * ${sqlOnePlus(tax)} AS DECIMAL(24,6))"

  /** SAFE oracle-side decimal→double cast for sums whose SCALED mantissa
    * can cross 2⁵³ (≈9.0e15). DuckDB converts a decimal by rounding the
    * integer mantissa to double FIRST and dividing by 10^scale second —
    * two roundings — while Spark's BigDecimal.doubleValue rounds once,
    * correctly. The divergence is real, not theoretical: at sf1 q1's
    * sum_charge is DECIMAL(38,6) ≈ 2.79e10 → mantissa 2.79e16 > 2⁵³, and
    * DuckDB lands 1 ulp high (…941593 vs the correctly-rounded …94159).
    *
    * The rewrite `double(trunc(s)) + double(s − trunc(s))` is exactly the
    * correctly-rounded conversion while |trunc(s)| < 2⁵³ (sums to ~9e15
    * currency units, sf ≈ 3e5): both addends are EXACT doubles (integer
    * part < 2⁵³; fractional part has scale-6 mantissa < 10⁶ — when it
    * isn't exactly representable its ≤2⁻⁵⁴ rounding error cannot move the
    * final IEEE add across a rounding boundary, because a scale-6 grid
    * point is never closer than 1/(10⁶·2¹⁹) ≈ 2e-12 to a double midpoint
    * at these magnitudes), and the one visible rounding is the add itself. */
  def sqlDSafe(s: String): String =
    s"(CAST(TRUNC($s) AS DOUBLE) + CAST($s - TRUNC($s) AS DOUBLE))"
}
