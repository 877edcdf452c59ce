package graft.tools

/** tempo2 shell-out scrape (SURVEY S15; tempo2_warp.py:28-48).
  *
  * `tempo2 -output general2 -s "{sentinel}..."` prints a block between
  * sentinel lines; the reference cuts the text between them, strips quotes,
  * and retries with `-nobs 1000000` when tempo2 refuses on TOA count
  * (tempo2_warp.py:32-41). The process runner is injectable so the scrape
  * logic is testable without the binary; the real runner is a driver-side
  * `scala.sys.process` call (rank-0 semantics, SURVEY §3.1).
  */
object Tempo2 {

  type Runner = Seq[String] => String

  val realRunner: Runner = cmd => scala.sys.process.Process(cmd).!!

  val Sentinel = "GRAFT_T2"

  /** `binary` defaults to `tempo2` on PATH; tests point it at a fake
    * script to exercise the REAL subprocess runner end-to-end. */
  def buildCmd(par: String, tim: String, fields: Seq[String],
      nobs: Option[Int], binary: String = "tempo2"): Seq[String] = {
    val fmt = fields.map(f => s"{$f}").mkString(s"$Sentinel ", "\t", s"\\n")
    Seq(binary, "-output", "general2", "-f", par, tim, "-s", fmt) ++
      nobs.toSeq.flatMap(n => Seq("-nobs", n.toString))
  }

  /** Cut lines between sentinels, strip surrounding quotes per field. */
  def scrape(output: String, fields: Seq[String]): Seq[Map[String, String]] =
    output.split("\n").toSeq
      .filter(_.startsWith(s"$Sentinel "))
      .map { line =>
        val vals = line.stripPrefix(s"$Sentinel ").split("\t")
          .map(_.trim.stripPrefix("\"").stripSuffix("\""))
        fields.zip(vals).toMap
      }

  /** Run with the `-nobs 1000000` retry on the TOA-ceiling error — both
    * failure shapes retry: ERROR text in the output (tempo2 exits 0 on
    * refusal) and a nonzero exit (`.!!` throws). */
  def run(par: String, tim: String, fields: Seq[String],
      runner: Runner = realRunner,
      binary: String = "tempo2"): Seq[Map[String, String]] = {
    val first = try Right(runner(buildCmd(par, tim, fields, None, binary)))
      catch { case e: Exception => Left(e) }
    val out = first match {
      case Right(o) if !o.contains("ERROR") => o
      case _ => runner(buildCmd(par, tim, fields, Some(1000000), binary))
    }
    scrape(out, fields)
  }
}
