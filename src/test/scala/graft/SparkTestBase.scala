package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session per suite (lazy — one JVM-wide session is fine,
  * getOrCreate reuses it across suites). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4)

  def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  def write(path: java.nio.file.Path, name: String, content: String): String = {
    val f = path.resolve(name)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }
}
