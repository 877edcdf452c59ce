package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types.{LongType, StringType, StructType}

class JsonQuarantineSpec extends SparkTestBase {

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  test("good rows parse, malformed lines quarantine with raw text intact") {
    val d = tmpDir("jsonq")
    write(d, "part.json",
      """{"id": 1, "name": "alpha"}
        |{"id": 2 "name": "broken"}
        |{"id": 3, "name": "gamma"}
        |not json at all
        |""".stripMargin)
    val (good, bad) = JsonQuarantine.read(spark, d.toString, schema)
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(g.toSeq == Seq((1L, "alpha"), (3L, "gamma")))
    val b = bad.collect().map(_.getString(0)).sorted
    assert(b.length == 2)
    assert(b.exists(_.contains("\"broken\"")))
    assert(b.contains("not json at all"))
  }

  test("a fully clean file quarantines nothing") {
    val d = tmpDir("jsonq2")
    write(d, "part.json", """{"id": 7, "name": "ok"}""" + "\n")
    val (good, bad) = JsonQuarantine.read(spark, d.toString, schema)
    assert(good.count() == 1 && bad.count() == 0)
  }
}
