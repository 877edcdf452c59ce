package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class MdSectionsSpec extends AnyFunSuite {

  private val doc =
    """# TITLE
      |
      |head table
      |
      |## alpha
      |
      |alpha body
      |
      |## beta
      |
      |beta body
      |""".stripMargin

  test("upsert replaces exactly its own section, preserving later ones") {
    val out = MdSections.upsert(doc, "## alpha", "## alpha v2\n\nnew body\n")
    assert(out.contains("## alpha v2"))
    assert(out.contains("new body"))
    assert(!out.contains("alpha body"))
    assert(out.contains("## beta") && out.contains("beta body"))
    assert(out.indexOf("# TITLE") == 0)
    // beta still AFTER alpha
    assert(out.indexOf("## beta") > out.indexOf("## alpha v2"))
  }

  test("upsert replaces the LAST section without eating the end") {
    val out = MdSections.upsert(doc, "## beta", "## beta v2\nb2\n")
    assert(out.contains("alpha body") && out.contains("## beta v2") &&
      out.contains("b2") && !out.contains("beta body"))
  }

  test("upsert appends when the heading is absent") {
    val out = MdSections.upsert(doc, "## gamma", "## gamma\ng\n")
    assert(out.contains("beta body") && out.endsWith("## gamma\ng\n"))
  }

  test("upsert on an empty document") {
    val out = MdSections.upsert("", "## alpha", "## alpha\na\n")
    assert(out.contains("## alpha\na"))
  }

  test("replaceHead swaps the preamble and keeps every section") {
    val out = MdSections.replaceHead(doc, "# NEW\n\nnew head\n")
    assert(out.startsWith("# NEW"))
    assert(!out.contains("head table"))
    assert(out.contains("## alpha") && out.contains("alpha body"))
    assert(out.contains("## beta") && out.contains("beta body"))
  }

  test("replaceHead on a document with no sections") {
    assert(MdSections.replaceHead("# OLD\nx\n", "# NEW\n") == "# NEW\n")
  }

  test("round-trip: three writers in any order never lose each other") {
    var d = ""
    d = MdSections.replaceHead(d, "# T\n\ntable\n")
    d = MdSections.upsert(d, "## sf0.1 → sf1 decade", "## sf0.1 → sf1 decade (x)\nd1\n")
    d = MdSections.upsert(d, "## banding knee probe", "## banding knee probe\nb1\n")
    d = MdSections.upsert(d, "## streaming throughput", "## streaming throughput\ns1\n")
    // re-run each in a scrambled order with new bodies
    d = MdSections.upsert(d, "## banding knee probe", "## banding knee probe\nb2\n")
    d = MdSections.replaceHead(d, "# T\n\ntable2\n")
    d = MdSections.upsert(d, "## sf0.1 → sf1 decade", "## sf0.1 → sf1 decade (y)\nd2\n")
    assert(d.contains("table2") && d.contains("d2") && d.contains("b2") && d.contains("s1"))
    assert(!d.contains("table\n## ") && !d.contains("d1") && !d.contains("b1"))
  }
}
