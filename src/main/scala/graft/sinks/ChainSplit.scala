package graft.sinks

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** K4: chain split writer (results.py:579-603).
  *
  * Moves the earliest `frac` of samples out of the hot chain file into a
  * separated piece `chain_<YYYYMMDDHHMMSS>[_<pars>].txt`, optionally
  * projecting a subset of parameter columns; the main file is rewritten in
  * place with the remainder (reference does backup-then-overwrite; here
  * write-new-then-atomic-rename via NoiseFileWriter.atomicWrite).
  *
  * Chain files are single-node sampler artifacts (MB-sized text) — this is
  * deliberate driver-side file surgery, not a distributed op; the
  * distributed read path is ChainReader.
  *
  * Timestamps are INPUTS (SURVEY §7.4.5: the reference stamps wall-clock
  * at results.py:585 — non-determinism we keep out of the engine).
  */
object ChainSplit {

  val TsFormat = "yyyyMMddHHmmss" // X12

  def stamp(epochMillis: Long): String =
    new java.text.SimpleDateFormat(TsFormat) {
      setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    }.format(new java.util.Date(epochMillis))

  def parseStamp(ts: String): Boolean = ts.length == 14 && ts.forall(_.isDigit)

  /** Split `dir/chain_1.txt`: earliest `frac` rows → separated file named
    * with `timestamp`; keep the rest in place. `parIdx` (optional) projects
    * those column indices in the separated piece, recorded in the filename
    * as `_<i>-<j>-...`. Returns (separatedPath, mainPath). */
  def separateEarliest(dir: String, frac: Double, timestamp: String,
      parIdx: Option[Seq[Int]] = None): (Path, Path) = {
    require(parseStamp(timestamp), s"timestamp must be $TsFormat: $timestamp")
    val main = Paths.get(s"$dir/chain_1.txt")
    val lines = Files.readAllLines(main).asScala.toSeq.filter(_.trim.nonEmpty)
    val nEarly = math.floor(frac * lines.length).toInt
    val (early, rest) = lines.splitAt(nEarly)
    val projected = parIdx match {
      case None => early
      case Some(idx) =>
        early.map { l =>
          val f = l.trim.split("\\s+")
          idx.map(f(_)).mkString(" ")
        }
    }
    val suffix = parIdx.map(i => "_" + i.mkString("-")).getOrElse("")
    val sep = Paths.get(s"$dir/chain_$timestamp$suffix.txt")
    NoiseFileWriter.atomicWrite(sep, projected.mkString("", "\n", "\n"))
    NoiseFileWriter.atomicWrite(main, rest.mkString("", "\n", "\n"))
    (sep, main)
  }
}
