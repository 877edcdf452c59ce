package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PSD / ORF scalar functions (SURVEY §2.8 X1-X7, X15) as pure column
  * expressions — zero UDFs, all codegen'd.
  */
object Psd {

  /** X15: the reference's physical constants (enterprise `const`). */
  object Constants {
    val DaySec: Double = 86400.0
    val YrSec: Double = 365.25 * 86400.0
    val FYr: Double = 1.0 / YrSec
    val RefFreqMhz: Double = 1400.0 // enterprise_warp.py:283-285
  }
  import Constants._

  /** X1: power-law PSD `10^(2 lgA) / (12π²) · yr³ · (f·yr)^(−γ)`
    * (red_psd, libstempo_warp.py:6-8). */
  def powerlaw(f: Column, lgA: Column, gamma: Column): Column =
    pow(lit(10.0), lgA * 2) / (lit(12.0) * lit(math.Pi) * lit(math.Pi)) *
      pow(lit(YrSec), 3.0) * pow(f * lit(YrSec), -gamma)

  /** X2: broken power law with corner frequency fc (negative ⇒ 10^fc)
    * (powerlaw_bpl, enterprise_models.py:593-603). */
  def powerlawBroken(f: Column, lgA: Column, gamma: Column, fc: Column): Column = {
    val fcEff = when(fc < 0, pow(lit(10.0), fc)).otherwise(fc)
    pow(lit(10.0), lgA * 2) / (lit(12.0) * lit(math.Pi) * lit(math.Pi)) *
      pow(lit(YrSec), 3.0) * pow((f + fcEff) * lit(YrSec), -gamma)
  }

  /** X3: DM PSD scaling `· K / ν²` with reference frequency 1400 MHz. */
  def dmScale(psd: Column, freqMhz: Column): Column =
    psd * pow(lit(RefFreqMhz) / freqMhz, 2.0)

  /** X4: Lorentzian PSD `P / (1 + (f/fc)²)^(α/2)` (libstempo_warp.py:17-18). */
  def lorentzian(f: Column, p0: Column, fc: Column, alpha: Column): Column =
    p0 / pow(lit(1.0) + pow(f / fc, 2.0), alpha / 2)

  /** X5: Hellings–Downs ORF: x=(1−cos ζ)/2 → 1.5x ln x − 0.25x + 0.5
    * (results.py:138-144). */
  def hellingsDowns(cosZeta: Column): Column = {
    val x = (lit(1.0) - cosZeta) / 2
    lit(1.5) * x * log(x) - lit(0.25) * x + lit(0.5)
  }

  /** X5 no-auto variant: 0 at ζ=0 (hd_orf_noauto, enterprise_models.py:605-612). */
  def hellingsDownsNoAuto(cosZeta: Column): Column =
    when(cosZeta >= 1.0, lit(0.0)).otherwise(hellingsDowns(cosZeta))

  /** X6: dipole / monopole ORFs (results.py:146-152). */
  def dipole(cosZeta: Column): Column = cosZeta
  def monopole(cosZeta: Column): Column = lit(1.0)

  /** X17: Fourier design-matrix columns sin/cos(2πk t/T) as array columns —
    * generated with `transform(sequence(...))`, no UDF, no driver loop. */
  def fourierBasis(tSec: Column, tspanSec: Column, nFreqs: Int): (Column, Column) = {
    val ks = sequence(lit(1), lit(nFreqs))
    val arg = (k: Column) => lit(2.0 * math.Pi) * k.cast("double") * tSec / tspanSec
    (transform(ks, k => sin(arg(k))), transform(ks, k => cos(arg(k))))
  }
}
