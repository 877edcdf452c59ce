package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class Tempo2Spec extends AnyFunSuite {

  private val goodOut =
    s"""Some tempo2 banner noise
       |${Tempo2.Sentinel} "56000.123"\t"1372.0"\t"pks"
       |${Tempo2.Sentinel} "56030.456"\t"732.0"\t"pks"
       |trailing noise""".stripMargin

  test("scrape cuts sentinel lines and strips quotes") {
    val rows = Tempo2.scrape(goodOut, Seq("sat", "freq", "site"))
    assert(rows.length === 2)
    assert(rows.head === Map("sat" -> "56000.123", "freq" -> "1372.0", "site" -> "pks"))
  }

  test("TOA-ceiling retry adds -nobs 1000000 (tempo2_warp.py:36-38)") {
    var calls = Seq.empty[Seq[String]]
    val runner: Tempo2.Runner = cmd => {
      calls :+= cmd
      if (calls.length == 1) "ERROR: too many TOAs" else goodOut
    }
    val rows = Tempo2.run("a.par", "a.tim", Seq("sat", "freq", "site"), runner)
    assert(calls.length === 2)
    assert(calls(1).containsSlice(Seq("-nobs", "1000000")))
    assert(rows.length === 2)
  }

  // ---- REAL subprocess path: a fake tempo2 script emitting the general2
  // sentinel format (tempo2_warp.py:28-48), exercised through realRunner —
  // the binary is absent from the environment, so the fixture is vendored
  // at test time. Each call's argv is logged to <script>.args for
  // verification.
  private def writeFakeTempo2(body: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-t2")
    val bin = dir.resolve("tempo2")
    java.nio.file.Files.writeString(bin,
      s"""#!/bin/sh
         |# printf, not echo: dash's echo expands the \\t/\\n escapes inside
         |# the -s format argument and splits the log line
         |printf '%s\\n' "$$*" >> "$$0.args"
         |$body
         |""".stripMargin)
    bin.toFile.setExecutable(true)
    bin
  }
  private val emitBlock =
    """echo "This is tempo2 banner noise"
      |printf 'GRAFT_T2 "56000.123"\t"1372.0"\t"pks"\n'
      |printf 'GRAFT_T2 "56030.456"\t"732.0"\t"pks"\n'
      |echo "Finishing off."""".stripMargin
  private def argLines(bin: java.nio.file.Path): Seq[String] =
    java.nio.file.Files.readAllLines(
      bin.resolveSibling("tempo2.args")).toArray.toSeq.map(_.toString)

  test("end-to-end subprocess run against a fake tempo2 binary") {
    val bin = writeFakeTempo2(emitBlock)
    val rows = Tempo2.run("a.par", "a.tim", Seq("sat", "freq", "site"),
      Tempo2.realRunner, bin.toString)
    assert(rows === Seq(
      Map("sat" -> "56000.123", "freq" -> "1372.0", "site" -> "pks"),
      Map("sat" -> "56030.456", "freq" -> "732.0", "site" -> "pks")))
    val calls = argLines(bin)
    assert(calls.length === 1)
    assert(calls.head.contains("-output general2"))
    assert(calls.head.contains("-f a.par a.tim"))
    assert(calls.head.contains("{sat}\t{freq}\t{site}"))
  }

  test("subprocess ERROR-text refusal (exit 0) triggers the -nobs retry") {
    // tempo2 refuses on TOA count with ERROR text but a ZERO exit; the
    // fake succeeds only when -nobs is present
    val bin = writeFakeTempo2(
      s"""ok=""
         |for a in "$$@"; do [ "$$a" = "-nobs" ] && ok=1; done
         |if [ -z "$$ok" ]; then echo "ERROR [general]: too many observations"; exit 0; fi
         |$emitBlock""".stripMargin)
    val rows = Tempo2.run("a.par", "a.tim", Seq("sat", "freq", "site"),
      Tempo2.realRunner, bin.toString)
    assert(rows.length === 2)
    val calls = argLines(bin)
    assert(calls.length === 2)
    assert(!calls(0).contains("-nobs") && calls(1).contains("-nobs 1000000"))
  }

  test("subprocess nonzero exit (realRunner throws) triggers the -nobs retry") {
    val bin = writeFakeTempo2(
      s"""ok=""
         |for a in "$$@"; do [ "$$a" = "-nobs" ] && ok=1; done
         |if [ -z "$$ok" ]; then echo "Segmentation fault imitation" >&2; exit 139; fi
         |$emitBlock""".stripMargin)
    val rows = Tempo2.run("a.par", "a.tim", Seq("sat", "freq", "site"),
      Tempo2.realRunner, bin.toString)
    assert(rows.length === 2)
    val calls = argLines(bin)
    assert(calls.length === 2 && calls(1).contains("-nobs 1000000"))
  }
}
