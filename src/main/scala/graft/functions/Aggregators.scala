package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY U5) — the only two aggregation
  * semantics the reference needs that Spark lacks as built-ins.
  * Both are algebraic (commutative, associative merge) so Spark applies
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
}
