package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ParReaderSpec extends SparkTestBase {

  private val parContent =
    """PSRJ           J0437-4715
      |RAJ            04:37:15.8961737  1  0.00000016
      |DECJ           -47:15:09.11071   1  0.00000210
      |F0             173.6879458121843 1  0.0000000000005
      |F1             -1.728358189e-15  1  0.0000000000031
      |PEPOCH         54500
      |DM             2.64476
      |UNITS          TCB
      |JUMP -f PDFB_20CM 0.000012 1
      |JUMP -f CASPSR_40CM -0.000034 1
      |""".stripMargin

  private lazy val dir = tmpDir("par")
  private lazy val path = write(dir, "J0437-4715_test.par", parContent)

  test("key/value rows with fit and uncertainty") {
    val p = ParReader.readParams(spark, path)
    assert(p.filter(col("key") === "JUMP").count() === 0)
    val f0 = p.filter(col("key") === "F0").head()
    assert(f0.getString(2) === "173.6879458121843")
    assert(f0.getInt(3) === 1)
    assert(f0.getDouble(4) === 5e-13)
    val pepoch = p.filter(col("key") === "PEPOCH").head()
    assert(pepoch.getString(2) === "54500")
    assert(pepoch.isNullAt(3))
  }

  test("JUMP selector rows become their own table") {
    val j = ParReader.readJumps(spark, path).orderBy(col("flagval"))
    assert(j.count() === 2)
    val rows = j.collect()
    assert(rows(0).getString(1) === "f")
    assert(rows(0).getString(2) === "CASPSR_40CM")
    assert(rows(0).getDouble(3) === -0.000034)
    assert(rows(1).getString(2) === "PDFB_20CM")
  }

  test("psr column from filename stem") {
    assert(ParReader.readParams(spark, path).select("psr").distinct().head().getString(0)
      === "J0437-4715")
  }
}
