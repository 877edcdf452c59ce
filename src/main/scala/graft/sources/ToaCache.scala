package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 replacement + SURVEY §4 row 1: the reference's (disabled) pickled
  * pulsar cache keyed by sha1(psr names + ephemeris)
  * (enterprise_warp.py:352-439) becomes a parquet cache of the TOA
  * DataFrame with the same deterministic key idea.
  */
object ToaCache {

  def cacheKey(psrs: Seq[String], ephemeris: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val bytes = md.digest((psrs.sorted.mkString(",") + "|" + ephemeris)
      .getBytes("UTF-8"))
    bytes.map("%02x".format(_)).mkString
  }

  def path(cacheDir: String, key: String): String = s"$cacheDir/toas_$key.parquet"

  /** Read-through: load the cached parquet if present, else build via
    * `loader`, write, and return the cached read (so downstream scans get
    * parquet pushdown/pruning either way). */
  def readThrough(spark: SparkSession, cacheDir: String, psrs: Seq[String],
      ephemeris: String)(loader: => DataFrame): DataFrame = {
    val p = path(cacheDir, cacheKey(psrs, ephemeris))
    if (!new java.io.File(p).exists()) {
      // write to a temp sibling then rename: a crashed partial write must
      // never be served as a complete cache on the next run
      val tmp = p + ".inprogress"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      loader.write.mode("overwrite").parquet(tmp)
      if (!new java.io.File(tmp).renameTo(new java.io.File(p)))
        throw new java.io.IOException(s"cache rename failed: $tmp -> $p")
    }
    spark.read.parquet(p)
  }
}
