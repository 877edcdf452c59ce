package graft.config

import org.scalatest.funsuite.AnyFunSuite
import ParamFile._

class ParamFileSpec extends AnyFunSuite {

  private val lines =
    """# run configuration
      |datadir: /data/toas
      |out: /results
      |nsamp: 5000
      |psrlist: J0001+0001 J0002+0002
      |{0}
      |model: model_a
      |noisefiles: /noise
      |{1}
      |model: model_b
      |""".stripMargin.split("\n").toSeq

  test("labels, sections, comments, multi-value lists") {
    val p = parse(lines)
    assert(p.common("datadir") === PStr("/data/toas"))
    assert(p.common("nsamp") === PInt(5000))
    assert(p.common("psrlist") === PList(Seq(PStr("J0001+0001"), PStr("J0002+0002"))))
    assert(p.models(0)("model") === PStr("model_a"))
    assert(p.models(1)("model") === PStr("model_b"))
    assert(!p.models(1).contains("noisefiles"))
  }

  test("defaults injected only for missing labels") {
    val p = withDefaults(parse(lines))
    assert(p.common("nsamp") === PInt(5000))       // explicit wins
    assert(p.common("sampler") === PStr("ptmcmcsampler")) // default
    assert(p.common("overwrite") === PStr("0"))
  }

  test("CLI override hits common and every model scope") {
    val p = overrideParam(parse(lines), "model", PStr("forced"))
    assert(p.models(0)("model") === PStr("forced"))
    assert(p.models(1)("model") === PStr("forced"))
  }

  test("strict mode raises on unknown label (reference KeyError)") {
    assertThrows[IllegalArgumentException] {
      parse(Seq("bogus_label: 1"), strict = true)
    }
  }

  test("registry extension admits catalog/sampler labels") {
    val reg = extendRegistry(baseRegistry, Seq("red_noise" -> "int", "dlogz" -> "float"))
    val p = parse(Seq("red_noise: 2", "dlogz: 0.1"), reg, strict = true)
    assert(p.common("red_noise") === PInt(2))
    assert(p.common("dlogz") === PDbl(0.1))
  }

  test("numeric-looking values typed by inference when unregistered") {
    val p = parse(Seq("mystery: 42", "other: 4.5", "name: abc"))
    assert(p.common("mystery") === PInt(42))
    assert(p.common("other") === PDbl(4.5))
    assert(p.common("name") === PStr("abc"))
  }
}
