package graft.signals

/** Prior ADT + sampler-facing translation (SURVEY U7/U8,
  * bilby_warp.py:40-106).
  *
  * The reference converts enterprise parameter objects to bilby priors:
  * Uniform / Normal / TruncatedNormal / LinearExponential, with VECTOR
  * parameters exploded to `name_0 … name_{n-1}` (bilby_warp.py:78-98).
  */
object Priors {

  sealed trait PriorDist { def name: String }
  case class Uniform(name: String, lo: Double, hi: Double) extends PriorDist
  case class Normal(name: String, mu: Double, sigma: Double) extends PriorDist
  case class TruncNormal(name: String, mu: Double, sigma: Double,
      lo: Double, hi: Double) extends PriorDist
  case class LinearExp(name: String, lo: Double, hi: Double) extends PriorDist

  /** Vector-parameter explosion: one scalar prior per component. */
  def explodeVector(p: PriorDist, size: Int): Seq[PriorDist] =
    (0 until size).map { i =>
      p match {
        case Uniform(n, a, b) => Uniform(s"${n}_$i", a, b)
        case Normal(n, m, s) => Normal(s"${n}_$i", m, s)
        case TruncNormal(n, m, s, a, b) => TruncNormal(s"${n}_$i", m, s, a, b)
        case LinearExp(n, a, b) => LinearExp(s"${n}_$i", a, b)
      }
    }

  /** Consistency check mirrored from bilby_warp.py:100-105: every sampled
    * parameter must carry a prior, and names must be unique. */
  def validate(pars: Seq[String], priors: Seq[PriorDist]): Either[String, Unit] = {
    val names = priors.map(_.name)
    val dup = names.diff(names.distinct).distinct
    if (dup.nonEmpty) Left(s"duplicate priors: ${dup.mkString(",")}")
    else {
      val missing = pars.filterNot(names.contains)
      if (missing.nonEmpty) Left(s"missing priors: ${missing.mkString(",")}")
      else Right(())
    }
  }

  /** U7: the likelihood adapter boundary — the engine treats "evaluate
    * log-likelihood at a point" as an injected function, exactly as the
    * reference delegates to enterprise's PTA object (bilby_warp.py:19-35).
    * Vector params regroup by name prefix before the call (:27-33). */
  trait LogLikelihood {
    def apply(params: Map[String, Double]): Double
  }

  /** Regroup exploded `name_i` scalars back to vectors by prefix. */
  def regroupVectors(params: Map[String, Double]): Map[String, Seq[Double]] = {
    val VecRe = """(.*)_(\d+)""".r
    params.toSeq.groupBy {
      case (VecRe(base, _), _) => base
      case (k, _) => k
    }.map { case (base, kvs) =>
      base -> kvs.sortBy {
        case (VecRe(_, i), _) => i.toInt
        case _ => 0
      }.map(_._2)
    }
  }
}
