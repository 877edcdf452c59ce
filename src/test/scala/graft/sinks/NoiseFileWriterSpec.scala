package graft.sinks

import graft.SparkTestBase

class NoiseFileWriterSpec extends SparkTestBase {

  test("noise-file JSON: sorted keys, indent 4, python-style numbers") {
    val out = NoiseFileWriter.renderSorted(Map(
      "J1_Z_equad" -> -6.5, "J1_A_efac" -> 1.0, "J1_red_gamma" -> 3.25))
    val expected =
      """{
        |    "J1_A_efac": 1.0,
        |    "J1_Z_equad": -6.5,
        |    "J1_red_gamma": 3.25
        |}""".stripMargin
    assert(out === expected)
  }

  test("per-pulsar files written from a (psr, param, value) summary") {
    import spark.implicits._
    val d = tmpDir("nfout")
    val summary = Seq(
      ("J0001", "J0001_efac", 1.1), ("J0001", "J0001_equad", -6.0),
      ("J0002", "J0002_efac", 0.9)).toDF("psr", "param", "value")
    val paths = NoiseFileWriter.writeNoiseFiles(summary, d.toString)
    assert(paths.map(_.getFileName.toString) === Seq("J0001_noise.json", "J0002_noise.json"))
    val j1 = java.nio.file.Files.readString(paths.head)
    assert(j1.contains("\"J0001_efac\": 1.1"))
  }

  test("pars.txt roundtrip with ChainReader") {
    val d = tmpDir("pars")
    val p = NoiseFileWriter.writeParsTxt(Seq("alpha", "beta"), s"$d/pars.txt")
    assert(graft.sources.ChainReader.readPars(spark, p.toString) === Seq("alpha", "beta"))
  }
}
