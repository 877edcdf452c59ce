package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave — the multi-dimension clustering key behind
  * data-skipping layouts: sorting by the interleaved key keeps rows that
  * are close in EITHER dimension in the same files, so per-file min/max
  * stats prune scans on both columns (a 1-D sort prunes only its own).
  *
  * `interleave16(a, b)` maps two pre-quantized 16-bit values into one
  * 32-bit key: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
  * Built from plain shift/and/or column arithmetic, so it stays inside
  * WholeStageCodegen and — like the unrolled dot-product SQL — can be
  * mirrored verbatim into an oracle query ([[interleave16Sql]]).
  */
object ZOrder {

  /** Both inputs must already be in [0, 65535] (caller quantizes —
    * clamping silently would hide scale bugs). */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** The identical computation as ANSI SQL over column names `a` and `b` —
    * one expression, mirrors [[interleave16]] term for term. */
  def interleave16Sql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Driver-side reference implementation (specs). */
  def interleave16Ref(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
