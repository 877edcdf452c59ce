package graft.sinks

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths, Path, StandardCopyOption}

/** File sinks (SURVEY §2.2).
  *
  * K2: per-pulsar noise-file JSON, PAL2 format `{"<PSR>_<param>": value}`,
  * SORTED keys, indent 4 (make_noise_files, results.py:236-248 — key order
  * matters because tempo2-side consumers hash the text).
  * K1: pars.txt (one name per line, enterprise_warp.py:553-555).
  * K4's backup-then-rewrite discipline: write-new-then-atomic-rename.
  */
object NoiseFileWriter {

  private def jsonNumber(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) {
      // integral doubles print like Python json (1.0, not 1)
      val l = v.toLong
      s"$l.0"
    } else v.toString

  /** Render a sorted, indent-4 JSON object — byte-stable output. */
  def renderSorted(params: Map[String, Double]): String =
    params.toSeq.sortBy(_._1).map { case (k, v) =>
      s"""    "$k": ${jsonNumber(v)}"""
    }.mkString("{\n", ",\n", "\n}")

  /** K2/K3: write one JSON per pulsar from a (psr, param, value) summary
    * DataFrame. The summary is aggregate-sized (a few rows per pulsar) —
    * collecting it to the driver is the MPI-rank-0 write of the reference
    * (SURVEY §3.1), not a data-path collect. */
  def writeNoiseFiles(summary: DataFrame, outDir: String,
      suffix: String = "noise"): Seq[Path] = {
    Files.createDirectories(Paths.get(outDir))
    val rows = summary.select("psr", "param", "value").collect()
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (psr, rs) =>
      val m = rs.map(r => r.getString(1) -> r.getDouble(2)).toMap
      atomicWrite(Paths.get(s"$outDir/${psr}_$suffix.json"), renderSorted(m))
    }
  }

  /** K1: pars.txt writer. */
  def writeParsTxt(pars: Seq[String], path: String): Path =
    atomicWrite(Paths.get(path), pars.mkString("", "\n", "\n"))

  /** Write to a temp sibling then rename — the reference's backup-then-
    * overwrite (results.py:592-603) without the torn-file window. */
  def atomicWrite(target: Path, content: String): Path = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    target
  }
}
