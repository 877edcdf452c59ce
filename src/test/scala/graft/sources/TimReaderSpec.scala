package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TimReaderSpec extends SparkTestBase {

  // Synthetic fixture following the .tim format (FIXTURES.md §1): header
  // lines start at column 0, data lines start with a space, trailing
  // -flag value pairs.
  private val timContent =
    """FORMAT 1
      |MODE 1
      | sub0001.rf 1372.123 56260.28623951240413348 1.245 pks -f PDFB_20CM -B 20CM -group PDFB_20CM
      | sub0002.rf 732.000 56300.12345678901234567 0.850 pks -f CASPSR_40CM -B 40CM -group CASPSR_40CM
      | sub0003.rf 1372.123 56350.99999999999999999 2.100 pks -f PDFB_20CM -B 20CM -group PDFB_20CM
      | sub0004.rf 3100.500 56400.50000000000000001 0.500 pks
      |""".stripMargin

  private lazy val dir = tmpDir("tim")
  private lazy val path = write(dir, "J0437-4715_test.tim", timContent)
  private lazy val toas = TimReader.read(spark, path)

  test("parses only data lines, full schema") {
    assert(toas.count() === 4)
    assert(toas.columns.toSet === Set("psr", "file", "freq_mhz", "toa_mjd",
      "toaerr_us", "site", "flags", "toa_sec"))
  }

  test("readTyped: Dataset[Toa] round-trips the schema with decimal MJD intact") {
    val ds = TimReader.readTyped(spark, path)
    val rows = ds.collect().sortBy(_.file)
    assert(rows.length === 4)
    assert(rows.head.psr === "J0437-4715")
    assert(rows.head.flags("group") === "PDFB_20CM")
    assert(rows.last.flags.isEmpty)
    // 19 significant digits survive the typed boundary
    assert(rows.head.toa_mjd.toPlainString.startsWith("56260.286239512404133"))
    // typed transformations stay on the same plan
    assert(ds.filter(_.freq_mhz > 1000.0).count() === 3)
  }

  test("pulsar name from path stem (split('_')[0])") {
    assert(toas.select("psr").distinct().collect().map(_.getString(0)).toSeq === Seq("J0437-4715"))
  }

  test("decimal MJD survives beyond double precision") {
    val mjd = toas.filter(col("file") === "sub0001.rf")
      .select(col("toa_mjd").cast("string")).head().getString(0)
    assert(mjd.startsWith("56260.286239512404133480"))
  }

  test("flags map parsed; rows without flags get empty map") {
    val withFlags = toas.filter(col("flags").getItem("group") === "PDFB_20CM")
    assert(withFlags.count() === 2)
    val none = toas.filter(size(map_keys(col("flags"))) === 0)
    assert(none.count() === 1)
  }

  test("flagSelection is the parameterized selection predicate (U4 deleted)") {
    assert(toas.filter(TimReader.flagSelection("B", "40CM")).count() === 1)
  }

  test("tspan = max - min of toa_sec per pulsar") {
    val t = TimReader.tspan(toas).head()
    val expected = (56400.50000000000000001 - 56260.28623951240413348) * 86400.0
    assert(math.abs(t.getDouble(1) - expected) < 1e-3)
  }

  test("backend error stats: rms and mean per flag value") {
    val stats = TimReader.backendErrorStats(toas, "f")
      .filter(col("backend") === "PDFB_20CM").head()
    val rms = math.sqrt((1.245 * 1.245 + 2.1 * 2.1) / 2)
    assert(math.abs(stats.getDouble(2) - rms) < 1e-12)
    assert(math.abs(stats.getDouble(3) - (1.245 + 2.1) / 2) < 1e-12)
  }

  test("par/tim pairing errors on count mismatch") {
    assertThrows[IllegalArgumentException] {
      TimReader.pairParTim(Seq("a.par"), Seq("a.tim", "b.tim"))
    }
    assert(TimReader.pairParTim(Seq("b.par", "a.par"), Seq("b.tim", "a.tim"))
      === Seq(("a.par", "a.tim"), ("b.par", "b.tim")))
  }

  test("psrlist filter passes all when empty") {
    assert(TimReader.filterPsrs(toas, Seq.empty).count() === 4)
    assert(TimReader.filterPsrs(toas, Seq("J9999+9999")).count() === 0)
  }

  test("nfreqs follows the Tobs/cadence rule") {
    assert(TimReader.nfreqs(140.0 * 86400, 60.0) === 2)
    assert(TimReader.nfreqs(30.0 * 86400, 60.0) === 1) // floor at 1
  }
}
