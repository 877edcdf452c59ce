package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LabelsSpec extends SparkTestBase {

  test("label sanitization: strip quotes/brackets/braces/colons, space to underscore (X10)") {
    assert(Labels.sanitize("""['spin_noise': powerlaw] {x}""") === "spin_noise_powerlaw_x")
  }

  test("output path composition (X11)") {
    assert(Labels.outputPath("/out/", Seq("model a", "gwb:hd"), Some(3), "J0437-4715")
      === "/out/model_a_gwbhd/3_J0437-4715/")
    assert(Labels.outputPath("/out", Seq("m"), None, "J1") === "/out/m/J1/")
  }

  test("digit and float predicates (X13)") {
    assert(Labels.isAllDigits("20240101120000") && !Labels.isAllDigits("12a") &&
      !Labels.isAllDigits(""))
    assert(Labels.isFloatCastable("-1.7e-15") && !Labels.isFloatCastable("x"))
  }

  test("latex wrapping (X14) and psr-from-path column (X9)") {
    assert(Labels.latexLabel("red_gamma") === "$red\ngamma$") // real newline
    import spark.implicits._
    val got = Seq("/data/toas/J0437-4715_pdfb.tim").toDF("p")
      .select(Labels.psrFromPath($"p")).head().getString(0)
    assert(got === "J0437-4715")
  }

  test("toa cache: deterministic key, read-through writes once (S3/§4)") {
    import spark.implicits._
    val k1 = graft.sources.ToaCache.cacheKey(Seq("J2", "J1"), "DE436")
    assert(k1 === graft.sources.ToaCache.cacheKey(Seq("J1", "J2"), "DE436"))
    assert(k1 !== graft.sources.ToaCache.cacheKey(Seq("J1", "J2"), "DE440"))
    val d = tmpDir("toacache")
    var builds = 0
    def load = { builds += 1; Seq(("J1", 1.0)).toDF("psr", "toa_sec") }
    val a = graft.sources.ToaCache.readThrough(spark, d.toString, Seq("J1"), "DE436")(load)
    val b = graft.sources.ToaCache.readThrough(spark, d.toString, Seq("J1"), "DE436")(load)
    assert(builds === 1 && a.count() === 1 && b.count() === 1)
  }

  test("info sinks: nfreqs file and output-dir lifecycle (K7/K9)") {
    val d = tmpDir("info")
    val p = graft.sinks.InfoSinks.writeNfreqsInfo(
      Seq(("group", "PDFB_20CM", 30), ("B", "40CM", 12)), s"$d/sel_nfreqs.txt")
    assert(java.nio.file.Files.readString(p) === "group;PDFB_20CM;30\nB;40CM;12\n")
    val out = s"$d/run1"
    assert(!graft.sinks.InfoSinks.prepareOutputDir(out, wipeOldOutput = false)) // fresh
    assert(graft.sinks.InfoSinks.prepareOutputDir(out, wipeOldOutput = false))  // resume
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/old.txt"), "x")
    assert(!graft.sinks.InfoSinks.prepareOutputDir(out, wipeOldOutput = true))  // wiped
    assert(!new java.io.File(s"$out/old.txt").exists())
  }

  test("function registry dispatch and custom registration (U1/U2)") {
    import graft.signals.FunctionRegistry
    import spark.implicits._
    val reg = FunctionRegistry.standard.register("half", { case Seq(c) => c / 2 })
    val v = Seq(1).toDF("x").select(reg("half", lit(8.0))).head().getDouble(0)
    assert(v === 4.0)
    val hd = Seq(1).toDF("x").select(reg("monopole", lit(0.3))).head().getDouble(0)
    assert(hd === 1.0)
    assertThrows[IllegalArgumentException](reg("nope", lit(1)))
  }
}
