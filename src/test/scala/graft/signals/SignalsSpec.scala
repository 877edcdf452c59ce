package graft.signals

import org.scalatest.funsuite.AnyFunSuite
import graft.config.OptionDsl
import NoiseModelCatalog._

class SignalsSpec extends AnyFunSuite {

  test("option DSL: nfreqs/ndays extraction and model reassembly") {
    val s = OptionDsl.parseFreqOption("30_nfreqs_powerlaw")
    assert(s.nFreqs === Some(30) && s.model === "powerlaw")
    val t = OptionDsl.parseFreqOption("turnover")
    assert(t.nFreqs === None && t.model === "turnover")
    val d = OptionDsl.parseFreqOption("45_ndays_powerlaw")
    assert(d.nDays === Some(45.0) && d.model === "powerlaw")
    val n = OptionDsl.parseFreqOption("4.33")
    assert(n.numeric === Some(4.33))
  }

  test("gwb option: '+'-split terms with orf/gamma/freesp dispatch") {
    import OptionDsl._
    assert(parseGwbOption("hd") === Seq(OrfGwb("hd", PowerlawGwb(None))))
    assert(parseGwbOption("hd+mono") ===
      Seq(OrfGwb("hd", PowerlawGwb(None)), OrfGwb("mono", PowerlawGwb(None))))
    assert(parseGwbTerm("freesp") === FreeSpectrum)
    assert(parseGwbTerm("hd_gamma_4.33") === OrfGwb("hd", PowerlawGwb(Some(4.33))))
  }

  test("standard catalog: signal dispatch, selections, priors") {
    val efac = Standard.build("efac", "by_backend")
    assert(efac.selectionFlag === Some("f"))
    val spin = Standard.build("spin_noise", "30_nfreqs_powerlaw")
    assert(spin.nFreqs === Some(30))
    assert(spin.priors.map(_.name) ===
      Seq("red_noise_log10_A", "red_noise_gamma"))
    assertThrows[IllegalArgumentException](Standard.build("bogus", ""))
  }

  test("const-prior detection (F12)") {
    assert(Prior("efac", -1.0, -1.0).isConst)
    assert(!Prior("efac", 0.0, 10.0).isConst)
  }

  test("catalog reflection loading + merge override") {
    val loaded = loadCatalog("graft.signals.TestCatalog")
    assert(loaded.build("my_signal", "x").priors.head.name === "my_par")
    val m = merged(Standard, loaded)
    assert(m.builders.contains("efac") && m.builders.contains("my_signal"))
  }

  test("prior explosion and vector regroup round-trip (U8/U7)") {
    import Priors._
    val exploded = explodeVector(Uniform("fcoef", -9, 9), 3)
    assert(exploded.map(_.name) === Seq("fcoef_0", "fcoef_1", "fcoef_2"))
    val grouped = regroupVectors(Map(
      "fcoef_0" -> 1.0, "fcoef_2" -> 3.0, "fcoef_1" -> 2.0, "efac" -> 1.1))
    assert(grouped("fcoef") === Seq(1.0, 2.0, 3.0))
    assert(grouped("efac") === Seq(1.1))
    assert(validate(Seq("a"), Seq(Uniform("a", 0, 1))).isRight)
    assert(validate(Seq("a", "b"), Seq(Uniform("a", 0, 1))).isLeft)
    assert(validate(Seq("a"), Seq(Uniform("a", 0, 1), Normal("a", 0, 1))).isLeft)
  }
}

/** Fixture for the reflection test — a "custom model" plugin. */
object TestCatalog extends NoiseModelCatalog.Catalog {
  val builders: Map[String, NoiseModelCatalog.Builder] = Map(
    "my_signal" -> (o => NoiseModelCatalog.SignalSpec("my_signal", o,
      Seq(NoiseModelCatalog.Prior("my_par", 0, 1)), None, None)))
}
