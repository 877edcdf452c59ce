package graft.sinks

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths, Path}

/** K7 + K9: small info sinks and the output-directory lifecycle. */
object InfoSinks {

  /** K7: `<sel>_nfreqs.txt` — `flag;flagval;n` rows
    * (enterprise_models.py:541-574). */
  def writeNfreqsInfo(rows: Seq[(String, String, Int)], path: String): Path =
    NoiseFileWriter.atomicWrite(Paths.get(path),
      rows.map { case (f, v, n) => s"$f;$v;$n" }.mkString("", "\n", "\n"))

  /** K6: OS results long table → parquet (replaces the reference's pickle,
    * results.py:1014-1039). */
  def writeOsResults(os: DataFrame, path: String): Unit =
    os.write.mode("overwrite").parquet(path)

  /** K9: mkdir / wipe-or-resume (enterprise_warp.py:475-483). Returns true
    * when the run should RESUME (dir existed and wipe=false). */
  def prepareOutputDir(dir: String, wipeOldOutput: Boolean): Boolean = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      if (wipeOldOutput) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(p.toFile)
        Files.createDirectories(p)
        false
      } else true
    } else {
      Files.createDirectories(p)
      false
    }
  }
}
