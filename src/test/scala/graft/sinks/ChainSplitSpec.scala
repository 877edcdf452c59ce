package graft.sinks

import graft.SparkTestBase

class ChainSplitSpec extends SparkTestBase {

  test("earliest-fraction split + in-place rewrite + readback (K4/E4)") {
    val d = tmpDir("split")
    val lines = (0 until 20).map(i => s"$i.0 ${i * 10}.0 -1 -2 0.5 0.25")
    java.nio.file.Files.writeString(d.resolve("chain_1.txt"),
      lines.mkString("", "\n", "\n"))
    val (sep, main) = ChainSplit.separateEarliest(d.toString, 0.25, "20240102030405")
    assert(sep.getFileName.toString === "chain_20240102030405.txt")
    assert(java.nio.file.Files.readAllLines(sep).size === 5)
    assert(java.nio.file.Files.readAllLines(main).size === 15)
    // ChainReader unions main + separated back to the full 20 steps, but
    // discovery order puts separated AFTER main → steps renumber; count holds
    val chain = graft.sources.ChainReader.readChain(spark, d.toString)
    assert(chain.count() === 20)
  }

  test("par projection subsets columns in the separated piece") {
    val d = tmpDir("split2")
    java.nio.file.Files.writeString(d.resolve("chain_1.txt"),
      "1 2 3\n4 5 6\n7 8 9\n10 11 12\n")
    val (sep, _) = ChainSplit.separateEarliest(d.toString, 0.5, "20240102030405",
      parIdx = Some(Seq(0, 2)))
    assert(sep.getFileName.toString === "chain_20240102030405_0-2.txt")
    assert(java.nio.file.Files.readAllLines(sep).get(0) === "1 3")
  }

  test("timestamp stamping and validation (X12)") {
    assert(ChainSplit.stamp(0L) === "19700101000000")
    assert(ChainSplit.parseStamp("20240102030405"))
    assert(!ChainSplit.parseStamp("2024010203040"))
    assertThrows[IllegalArgumentException] {
      ChainSplit.separateEarliest("/tmp", 0.1, "nope")
    }
  }
}
