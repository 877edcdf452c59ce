package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property test (SURVEY §5): random TOA rows rendered to .tim text parse
  * back identically through TimReader.
  */
class TimRoundTripSpec extends SparkTestBase {

  private case class Toa(file: String, freq: Double, mjdMicroDay: Long,
      err: Double, site: String, flags: List[(String, String)])

  private val genFlag = for {
    k <- Gen.oneOf("f", "g", "B", "group", "pta", "snr")
    v <- Gen.oneOf("PDFB_20CM", "CASPSR_40CM", "WBCORR_10CM", "x1", "7.5")
  } yield (k, v)

  private val genToa = for {
    file <- Gen.oneOf("a.rf", "b.rf", "sub_001.rf")
    freq <- Gen.choose(100.0, 4000.0)
    mjd <- Gen.choose(40000L * 1000000L, 60000L * 1000000L) // µday grid
    err <- Gen.choose(0.01, 100.0)
    site <- Gen.oneOf("pks", "7", "gbt")
    flags <- Gen.listOfN(3, genFlag).map(_.distinctBy(_._1))
  } yield Toa(file, freq, mjd, err, site, flags)

  private def render(toas: List[Toa]): String =
    toas.map { t =>
      val mjd = BigDecimal(t.mjdMicroDay) / BigDecimal(1000000)
      val flagStr = t.flags.map { case (k, v) => s"-$k $v" }.mkString(" ")
      s" ${t.file} ${t.freq} $mjd ${t.err} ${t.site} $flagStr"
    }.mkString("FORMAT 1\n", "\n", "\n")

  test("render → read round-trip preserves every field and flag") {
    val prop = forAll(Gen.nonEmptyListOf(genToa)) { toas =>
      val d = tmpDir("timrt")
      val path = write(d, "J0001+0001_rt.tim", render(toas))
      val got = TimReader.read(spark, path)
        .orderBy(col("toa_mjd"))
        .collect()
      val exp = toas.sortBy(_.mjdMicroDay)
      got.length == exp.length && got.zip(exp).forall { case (row, t) =>
        row.getString(1) == t.file &&
          row.getDouble(2) == t.freq &&
          row.getDouble(4) == t.err &&
          row.getString(5) == t.site &&
          row.getAs[Map[String, String]]("flags") == t.flags.toMap &&
          (row.getDecimal(3).doubleValue() - t.mjdMicroDay / 1e6).abs < 1e-6
      }
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(r.passed, r.status.toString)
  }
}
