package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import Psd.Constants._

class PsdSpec extends SparkTestBase {

  private def eval(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)
  }

  test("power-law PSD matches the closed form") {
    val f = 1e-8
    val lgA = -14.0
    val gamma = 13.0 / 3
    val got = eval(Psd.powerlaw(lit(f), lit(lgA), lit(gamma)))
    val exp = math.pow(10, 2 * lgA) / (12 * math.Pi * math.Pi) *
      math.pow(YrSec, 3) * math.pow(f * YrSec, -gamma)
    assert(math.abs(got / exp - 1) < 1e-12)
  }

  test("broken power law: negative fc means 10^fc") {
    val got = eval(Psd.powerlawBroken(lit(1e-8), lit(-14.0), lit(4.0), lit(-8.0)))
    val fc = math.pow(10, -8.0)
    val exp = math.pow(10, -28.0) / (12 * math.Pi * math.Pi) *
      math.pow(YrSec, 3) * math.pow((1e-8 + fc) * YrSec, -4.0)
    assert(math.abs(got / exp - 1) < 1e-12)
  }

  test("Hellings-Downs: 0.5 at zeta->0 limit shape; no-auto returns 0 at zero separation") {
    // x = (1-cos z)/2; at cos z = -1 (antipodal) x = 1 → hd = -0.25+0.5 = 0.25
    assert(math.abs(eval(Psd.hellingsDowns(lit(-1.0))) - 0.25) < 1e-12)
    assert(eval(Psd.hellingsDownsNoAuto(lit(1.0))) === 0.0)
    // known midpoint: cos z = 0 → x = 0.5 → 0.75·ln 0.5 − 0.125 + 0.5
    val exp = 1.5 * 0.5 * math.log(0.5) - 0.25 * 0.5 + 0.5
    assert(math.abs(eval(Psd.hellingsDowns(lit(0.0))) - exp) < 1e-12)
  }

  test("DM scaling is (1400/f)^2") {
    assert(math.abs(eval(Psd.dmScale(lit(1.0), lit(700.0))) - 4.0) < 1e-12)
  }

  test("Fourier basis arrays have nFreqs sin/cos entries with the right phase") {
    import spark.implicits._
    val (sinB, cosB) = Psd.fourierBasis(lit(0.25), lit(1.0), 3)
    val row = Seq(1).toDF("x").select(sinB.as("s"), cosB.as("c")).head()
    val s = row.getSeq[Double](0)
    val c = row.getSeq[Double](1)
    assert(s.length === 3 && c.length === 3)
    assert(math.abs(s.head - math.sin(2 * math.Pi * 0.25)) < 1e-12)
    assert(math.abs(c(1) - math.cos(4 * math.Pi * 0.25)) < 1e-12)
  }

  test("lorentzian at f=fc, alpha=2 halves the plateau") {
    assert(math.abs(eval(Psd.lorentzian(lit(1.0), lit(2.0), lit(1.0), lit(2.0))) - 1.0) < 1e-12)
  }
}
