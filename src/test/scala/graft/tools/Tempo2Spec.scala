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
}
