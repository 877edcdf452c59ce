package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NoiseJsonSpec extends SparkTestBase {

  private lazy val dir = tmpDir("noise")

  private def mkSpec(): String = write(dir, "model.json",
    """{
      |  "model_name": "example",
      |  "universal": {"efac": "by_backend", "spin_noise": "powerlaw"},
      |  "common_signals": {"gwb": "hd"},
      |  "J0001+0001": {"spin_noise": "turnover",
      |                 "system_noise": ["SYS_A", "SYS_B"]}
      |}""".stripMargin)

  test("model spec flattens to (psr, signal, option) long form") {
    import spark.implicits._
    val spec = NoiseJson.modelSpecDf(spark, mkSpec())
    assert(spec.count() === 5)
    assert(spec.filter($"psr" === "universal").count() === 2)
    val sys = spec.filter($"signal" === "system_noise").head().getString(2)
    assert(sys === """["SYS_A","SYS_B"]""")
  }

  test("per-pulsar option falls back to universal (J2)") {
    import spark.implicits._
    val spec = NoiseJson.modelSpecDf(spark, mkSpec())
    val psrs = Seq("J0001+0001", "J0002+0002").toDF("psr")
    val resolved = NoiseJson.resolveSignals(psrs, spec)
    def opt(p: String, s: String) =
      resolved.filter($"psr" === p && $"signal" === s).head().getString(2)
    assert(opt("J0001+0001", "spin_noise") === "\"turnover\"") // per-psr wins
    assert(opt("J0002+0002", "spin_noise") === "\"powerlaw\"") // universal
    assert(opt("J0002+0002", "efac") === "\"by_backend\"")
  }

  test("merge upsert: scalars overridden, lists set-unioned (J4)") {
    import spark.implicits._
    val base = Seq(
      ("J1", "spin_noise", "\"powerlaw\""),
      ("J1", "system_noise", """["A","B"]""")).toDF("psr", "signal", "option")
    val extra = Seq(
      ("J1", "spin_noise", "\"turnover\""),
      ("J1", "system_noise", """["B","C"]"""),
      ("J2", "efac", "1")).toDF("psr", "signal", "option")
    val merged = NoiseJson.mergeSpecs(base, extra)
    def opt(p: String, s: String) =
      merged.filter($"psr" === p && $"signal" === s).head().getString(2)
    assert(opt("J1", "spin_noise") === "\"turnover\"")
    assert(opt("J1", "system_noise") === """["A","B","C"]""")
    assert(opt("J2", "efac") === "1")
  }

  test("noise files: name-filtered glob union, last-write-wins (S6)") {
    val d2 = tmpDir("noisefiles")
    write(d2, "J0001+0001_noise.json",
      """{"J0001+0001_PDFB_efac": 1.05, "J0001+0001_red_noise_log10_A": -14.2}""")
    write(d2, "J0001+0001_noise_v2.json", """{"J0001+0001_PDFB_efac": 1.10}""")
    write(d2, "J0009+0009_noise.json", """{"J0009+0009_PDFB_efac": 9.0}""")
    val nf = NoiseJson.readNoiseFiles(spark, d2.toString, Seq("J0001+0001"))
    assert(nf.count() === 2)
    val efac = nf.filter(col("param") === "J0001+0001_PDFB_efac").head().getDouble(1)
    assert(efac === 1.10) // v2 sorts later → wins
  }

  test("param classification cascade (F13)") {
    import spark.implicits._
    val nf = Seq(("J1_PDFB_efac", 1.0), ("J1_PDFB_equad", -6.0),
      ("J1_red_noise_gamma", 3.3), ("J1_dm_gp_log10_A", -13.0))
      .toDF("param", "value")
    val k = NoiseJson.classifyParams(nf)
    def kind(p: String) = k.filter($"param" === p).head().getAs[String]("kind")
    assert(kind("J1_PDFB_efac") === "efac")
    assert(kind("J1_PDFB_equad") === "equad")
    assert(kind("J1_red_noise_gamma") === "red")
    assert(kind("J1_dm_gp_log10_A") === "dm")
  }
}
