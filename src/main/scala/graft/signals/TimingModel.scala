package graft.signals

import breeze.linalg.{DenseMatrix, DenseVector, cholesky, svd}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}

/** Per-pulsar timing-model linear algebra (SURVEY §7.4.3; reference
  * `enterprise_warp.py:500-508` timing-model dispatch, `:277-279` `tm_svd`).
  *
  * The reference delegates this to enterprise's `gp_signals.TimingModel` /
  * `MarginalizingTimingModel(use_svd=...)`; the math is the published
  * rank-reduced pulsar-timing likelihood (van Haasteren & Vallisneri 2014;
  * Lentati et al. 2013): residuals r with white noise
  * N = diag(efac_b² σ_i² + 10^{2·log10_equad_b}), a design matrix M whose
  * coefficients carry an (effectively) infinite Gaussian prior, and
  * low-rank Fourier GP bases F for red / DM noise with power-law spectral
  * priors φ. Everything marginalizes analytically via Woodbury:
  *
  *   lnL = −½ (rᵀN⁻¹r − dᵀA⁻¹d) − ½ ln|N| − ½ ln|B| − ½ ln|A| − n/2·ln 2π
  *   with T=[M F], d=TᵀN⁻¹r, A=B⁻¹+TᵀN⁻¹T, B=diag(1e40…, φ…)
  *
  * Spark-first split: the matrices live INSIDE `mapGroups` per pulsar —
  * only (psr, TOA columns) rows cross the shuffle and only
  * (psr, param, value) rows come out, never a matrix (SURVEY §7.4.3
  * "aggregate coefficients, not matrices"). A 1000-executor run fits every
  * pulsar in parallel with zero driver-side linear algebra.
  */
object TimingModel {

  // ---------------------------------------------------------------- pure core

  /** Per-pulsar timing-model inputs distilled from the `.par` file
    * (ParReader): epoch for the spin terms, JUMP selectors, DM presence. */
  case class ParInfo(
      psr: String,
      pepochMjd: Double,
      jumpGroups: Seq[(String, String)] = Nil, // (flag, flagval)
      includeDm: Boolean = false)

  /** One TOA row as the fit consumes it — the only thing that crosses the
    * shuffle. `resid_sec` is an input column: the engine does not own a
    * full timing solution (the reference gets residuals from
    * libstempo/PINT inside `enterprise.Pulsar`); callers supply measured
    * or simulated residuals. */
  case class ToaFit(psr: String, t_sec: Double, toaerr_us: Double,
      freq_mhz: Double, backend: String, flags: Map[String, String],
      resid_sec: Double)

  /** Timing-model design matrix, enterprise column set
    * (`gp_signals.TimingModel`): offset, spin (dt, dt²/2), optional DM
    * (1/ν², dt/ν² — the dispersive delay and its drift; the physical
    * constant cancels under column normalization), one indicator column
    * per JUMP selector. Zero-norm columns (JUMP flag absent from this
    * pulsar's TOAs) are dropped, mirroring tempo2's fit behavior. */
  def designMatrix(tSec: Array[Double], freqMhz: Array[Double],
      flags: Array[Map[String, String]], par: ParInfo): DenseMatrix[Double] = {
    val n = tSec.length
    val pepochSec = par.pepochMjd * 86400.0
    val dt = tSec.map(_ - pepochSec)
    val cols = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    cols += Array.fill(n)(1.0)
    cols += dt
    cols += dt.map(d => 0.5 * d * d)
    if (par.includeDm) {
      val nu2 = freqMhz.map(f => 1.0 / (f * f))
      cols += nu2
      cols += Array.tabulate(n)(i => dt(i) * nu2(i))
    }
    par.jumpGroups.foreach { case (flag, value) =>
      cols += flags.map(m => if (m.get(flag).contains(value)) 1.0 else 0.0)
    }
    val kept = cols.filter(c => math.sqrt(c.map(x => x * x).sum) > 0.0)
    DenseMatrix(kept.toSeq: _*).t // n × m
  }

  /** Column-norm normalization — enterprise's default (`normed=True`)
    * conditioning of M before the Woodbury solve. */
  def normalizeColumns(m: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = m.copy
    (0 until m.cols).foreach { j =>
      val nrm = breeze.linalg.norm(m(::, j))
      if (nrm > 0) out(::, j) := m(::, j) / nrm
    }
    out
  }

  /** `tm_svd` stabilization (ref `enterprise_warp.py:277-279,501`):
    * replace M with its left singular vectors — an orthonormal basis of
    * the same column space, immune to the 10-plus-decade dynamic range
    * between offset and dt² columns. Rank-revealing: directions with
    * singular value below `rcond·s₀` are dropped. */
  def svdStabilize(m: DenseMatrix[Double], rcond: Double = 1e-15): DenseMatrix[Double] = {
    val svd.SVD(u, s, _) = svd.reduced(m)
    val r = s.toArray.count(_ > s(0) * rcond)
    u(::, 0 until r).copy
  }

  /** Scalar twin of [[graft.functions.Psd.powerlaw]] (same formula, same
    * constants) for driver/executor-side φ assembly:
    * `10^{2 lgA} / (12π²) · yr³ · (f·yr)^{−γ}`. */
  def powerlawPsd(f: Double, lgA: Double, gamma: Double): Double = {
    val yr = graft.functions.Psd.Constants.YrSec
    math.pow(10.0, 2 * lgA) / (12.0 * math.Pi * math.Pi) *
      math.pow(yr, 3.0) * math.pow(f * yr, -gamma)
  }

  /** Fourier GP basis: columns sin(2πk t/T), cos(2πk t/T), k = 1..nFreq —
    * the Breeze twin of [[graft.functions.Psd.fourierBasis]] (X17) for
    * inside-`mapGroups` use. Returns (F n×2k, frequencies f_k = k/T). */
  def fourierDesign(tSec: Array[Double], tspanSec: Double, nFreq: Int)
      : (DenseMatrix[Double], Array[Double]) = {
    val n = tSec.length
    val f = DenseMatrix.zeros[Double](n, 2 * nFreq)
    val freqs = Array.tabulate(nFreq)(k => (k + 1) / tspanSec)
    var i = 0
    while (i < n) {
      var k = 0
      while (k < nFreq) {
        val arg = 2.0 * math.Pi * freqs(k) * tSec(i)
        f(i, 2 * k) = math.sin(arg)
        f(i, 2 * k + 1) = math.cos(arg)
        k += 1
      }
      i += 1
    }
    (f, freqs)
  }

  /** The DM basis is the red basis with the dispersive 1/ν² per-TOA
    * scaling baked into the columns (ref convention: 1400 MHz reference
    * frequency, matching [[graft.functions.Psd.dmScale]]), so its φ stays
    * the plain power law. */
  def dmDesign(tSec: Array[Double], freqMhz: Array[Double], tspanSec: Double,
      nFreq: Int): (DenseMatrix[Double], Array[Double]) = {
    val (f, freqs) = fourierDesign(tSec, tspanSec, nFreq)
    val ref = graft.functions.Psd.Constants.RefFreqMhz
    (0 until tSec.length).foreach { i =>
      val sc = (ref / freqMhz(i)) * (ref / freqMhz(i))
      f(i, ::) := f(i, ::) * sc
    }
    (f, freqs)
  }

  /** Enterprise's TimingModel coefficient variance — "infinite" prior. */
  val TmPriorVariance: Double = 1e40

  /** Marginalized Gaussian likelihood over (timing model ⊕ red GP ⊕ DM GP)
    * — the U7 [[Priors.LogLikelihood]] boundary made concrete. Parameter
    * names follow the reference noise-file convention
    * (`{psr}_{backend}_efac`, `{psr}_{backend}_log10_equad`,
    * `{psr}_red_noise_{log10_A,gamma}`, `{psr}_dm_gp_{log10_A,gamma}`,
    * results.py:236-248); missing white-noise params default to
    * efac 1 / equad 0 exactly as enterprise treats unlisted backends. */
  class MarginalizedLikelihood(
      val psr: String,
      resid: DenseVector[Double],
      sigmaSec: DenseVector[Double],
      backends: Array[String],
      m: DenseMatrix[Double],
      red: Option[(DenseMatrix[Double], Array[Double], Double)], // (F, f_k, T)
      dm: Option[(DenseMatrix[Double], Array[Double], Double)])
      extends Priors.LogLikelihood {

    private val n = resid.length
    private val t: DenseMatrix[Double] = (red, dm) match {
      case (Some((fr, _, _)), Some((fd, _, _))) =>
        DenseMatrix.horzcat(m, fr, fd)
      case (Some((fr, _, _)), None) => DenseMatrix.horzcat(m, fr)
      case (None, Some((fd, _, _))) => DenseMatrix.horzcat(m, fd)
      case (None, None) => m
    }
    private val nm = m.cols

    def apply(params: Map[String, Double]): Double = {
      // N diagonal: efac_b² σ² + equad_b² per TOA (enterprise white noise)
      val ninv = DenseVector.zeros[Double](n)
      var lnDetN = 0.0
      var i = 0
      while (i < n) {
        val b = backends(i)
        val ef = params.getOrElse(s"${psr}_${b}_efac", 1.0)
        val lq = params.get(s"${psr}_${b}_log10_equad")
        val eq2 = lq.map(v => math.pow(10.0, 2 * v)).getOrElse(0.0)
        val nii = ef * ef * sigmaSec(i) * sigmaSec(i) + eq2
        ninv(i) = 1.0 / nii
        lnDetN += math.log(nii)
        i += 1
      }
      // B diagonal: huge for timing-model cols, φ = psd·Δf for GP cols
      // (Δf = 1/T, enterprise's Fourier-basis convention); sin and cos of
      // the same frequency share one φ.
      val bDiag = DenseVector.zeros[Double](t.cols)
      (0 until nm).foreach(j => bDiag(j) = TmPriorVariance)
      var off = nm
      red.foreach { case (fr, freqs, tspan) =>
        val lgA = params.getOrElse(s"${psr}_red_noise_log10_A", -20.0)
        val gam = params.getOrElse(s"${psr}_red_noise_gamma", 0.0)
        freqs.zipWithIndex.foreach { case (f, k) =>
          val phi = powerlawPsd(f, lgA, gam) / tspan
          bDiag(off + 2 * k) = phi
          bDiag(off + 2 * k + 1) = phi
        }
        off += fr.cols
      }
      dm.foreach { case (fd, freqs, tspan) =>
        val lgA = params.getOrElse(s"${psr}_dm_gp_log10_A", -20.0)
        val gam = params.getOrElse(s"${psr}_dm_gp_gamma", 0.0)
        freqs.zipWithIndex.foreach { case (f, k) =>
          val phi = powerlawPsd(f, lgA, gam) / tspan
          bDiag(off + 2 * k) = phi
          bDiag(off + 2 * k + 1) = phi
        }
      }
      // Woodbury: A = B⁻¹ + Tᵀ N⁻¹ T; lnL per the object doc
      val ninvR = resid *:* ninv
      val rNr = resid dot ninvR
      val d = t.t * ninvR
      // A = Tᵀ diag(ninv) T via one row-scaled copy of T
      val tScaled = t.copy
      (0 until n).foreach(i2 => tScaled(i2, ::) :*= ninv(i2))
      val a0 = t.t * tScaled
      // exact symmetrization — BLAS gemm leaves ulp-level asymmetry that
      // breeze's cholesky rejects
      val a = (a0 + a0.t) *:* 0.5
      (0 until t.cols).foreach(j => a(j, j) += 1.0 / bDiag(j))
      val l = cholesky(a)
      var lnDetA = 0.0
      (0 until t.cols).foreach(j => lnDetA += 2.0 * math.log(l(j, j)))
      val lnDetB = breeze.linalg.sum(bDiag.map(math.log))
      // forward-substitute L y = d, then quadratic form dᵀA⁻¹d = |y|²
      val y = DenseVector.zeros[Double](t.cols)
      var j = 0
      while (j < t.cols) {
        var s = d(j)
        var k = 0
        while (k < j) { s -= l(j, k) * y(k); k += 1 }
        y(j) = s / l(j, j)
        j += 1
      }
      val quad = y dot y
      -0.5 * (rNr - quad) - 0.5 * (lnDetN + lnDetB + lnDetA) -
        0.5 * n * math.log(2.0 * math.Pi)
    }
  }

  // ---------------------------------------------------------- fit machinery

  /** Fit configuration: Fourier sizes and the coordinate-ascent grids.
    * `passes` sweeps of 1-D grid maximization over every parameter — the
    * deterministic, seed-free optimizer a golden test wants (the reference
    * leaves optimization to its external samplers, SURVEY §3.1). */
  case class FitConfig(
      nFreqRed: Int = 15,
      nFreqDm: Int = 15,
      useSvd: Boolean = true,
      fitRed: Boolean = true,
      fitDm: Boolean = true,
      efacGrid: Seq[Double] = (2 to 60).map(_ * 0.05), // 0.10 .. 3.00
      equadGrid: Seq[Double] = (-90 to -50).map(_ * 0.1), // log10: -9.0 .. -5.0
      lgAGrid: Seq[Double] = (-160 to -110).map(_ * 0.1), // -16.0 .. -11.0
      gammaGrid: Seq[Double] = (2 to 12).map(_ * 0.5), // 1.0 .. 6.0
      passes: Int = 2)

  /** Per-pulsar noise fit: coordinate ascent of [[MarginalizedLikelihood]]
    * over per-backend (efac, log10_equad) and the red/DM hyperpriors.
    * Pure function of the TOA slice — called inside `mapGroups`. */
  def fitOne(rows: Array[ToaFit], par: ParInfo, cfg: FitConfig)
      : Map[String, Double] = {
    val sorted = rows.sortBy(_.t_sec)
    val tSec = sorted.map(_.t_sec)
    val freq = sorted.map(_.freq_mhz)
    val flags = sorted.map(_.flags)
    val backs = sorted.map(_.backend)
    val sigma = DenseVector(sorted.map(_.toaerr_us * 1e-6))
    val resid = DenseVector(sorted.map(_.resid_sec))
    val tspan = tSec.max - tSec.min
    val m0 = designMatrix(tSec, freq, flags, par)
    val m = if (cfg.useSvd) svdStabilize(m0) else normalizeColumns(m0)
    val red = if (cfg.fitRed) {
      val (fr, fs) = fourierDesign(tSec, tspan, cfg.nFreqRed)
      Some((fr, fs, tspan))
    } else None
    val dm = if (cfg.fitDm && par.includeDm) {
      val (fd, fs) = dmDesign(tSec, freq, tspan, cfg.nFreqDm)
      Some((fd, fs, tspan))
    } else None
    val psr = par.psr
    val lik = new MarginalizedLikelihood(psr, resid, sigma, backs, m, red, dm)

    val backendList = backs.distinct.sorted
    val dims: Seq[(String, Seq[Double])] =
      backendList.flatMap(b => Seq(
        (s"${psr}_${b}_efac", cfg.efacGrid),
        (s"${psr}_${b}_log10_equad", cfg.equadGrid))) ++
        (if (red.isDefined) Seq(
          (s"${psr}_red_noise_log10_A", cfg.lgAGrid),
          (s"${psr}_red_noise_gamma", cfg.gammaGrid)) else Nil) ++
        (if (dm.isDefined) Seq(
          (s"${psr}_dm_gp_log10_A", cfg.lgAGrid),
          (s"${psr}_dm_gp_gamma", cfg.gammaGrid)) else Nil)

    var cur: Map[String, Double] = dims.map { case (name, grid) =>
      name -> (if (name.endsWith("_efac")) 1.0 else grid(grid.length / 2))
    }.toMap
    (1 to cfg.passes).foreach { _ =>
      dims.foreach { case (name, grid) =>
        val best = grid.maxBy(v => lik(cur.updated(name, v)))
        cur = cur.updated(name, best)
      }
    }
    cur
  }

  // ----------------------------------------------------------- Spark boundary

  /** Distributed per-pulsar fit: shuffle is (psr → TOA rows) only; design
    * matrices, SVDs and Cholesky factors are task-local; output is the
    * aggregate-sized (psr, param, value) noise summary that
    * [[graft.sinks.NoiseFileWriter.writeNoiseFiles]] consumes (K2). */
  def fitNoise(toas: Dataset[ToaFit], pars: Map[String, ParInfo],
      cfg: FitConfig = FitConfig()): DataFrame = {
    val spark = toas.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(String, String, Double)] =
      Encoders.product[(String, String, Double)]
    toas.groupByKey(_.psr)
      .flatMapGroups { (psr, it) =>
        pars.get(psr) match {
          case None => Iterator.empty
          case Some(par) =>
            fitOne(it.toArray, par, cfg).iterator.map {
              case (k, v) => (psr, k, v)
            }
        }
      }
      .toDF("psr", "param", "value")
  }

  /** Adapter from the [[graft.sources.TimReader]] schema + a residual
    * column to [[ToaFit]] rows; backend = the `-{backendFlag}` flag. */
  def toaFitRows(toas: DataFrame, residCol: String,
      backendFlag: String = "group"): Dataset[ToaFit] = {
    import org.apache.spark.sql.functions._
    val spark = toas.sparkSession
    import spark.implicits._
    toas.select(
        col("psr"),
        col("toa_sec").as("t_sec"),
        col("toaerr_us"),
        col("freq_mhz"),
        coalesce(col("flags").getItem(backendFlag), lit("none")).as("backend"),
        col("flags"),
        col(residCol).cast("double").as("resid_sec"))
      .as[ToaFit]
  }

  /** [[ParInfo]] from ParReader output — driver-side, dimension-table
    * sized (a handful of rows per pulsar). */
  def parInfo(params: DataFrame, jumps: DataFrame): Map[String, ParInfo] = {
    val kv = params.select("psr", "key", "value").collect()
      .groupBy(_.getString(0))
    val jm = jumps.select("psr", "flag", "flagval").collect()
      .groupBy(_.getString(0))
    kv.map { case (psr, rows) =>
      val m = rows.map(r => r.getString(1) -> r.getString(2)).toMap
      psr -> ParInfo(
        psr = psr,
        pepochMjd = m.get("PEPOCH").map(_.toDouble).getOrElse(
          m.get("START").map(_.toDouble).getOrElse(0.0)),
        jumpGroups = jm.getOrElse(psr, Array.empty[org.apache.spark.sql.Row])
          .map(r => (r.getString(1), r.getString(2))).toSeq,
        includeDm = m.contains("DM"))
    }
  }
}
