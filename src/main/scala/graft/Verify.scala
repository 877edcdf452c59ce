package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Queries run 4 at
  * a time — the Spark scheduler is thread-safe and the local cluster is
  * otherwise underutilized by small single-query jobs. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  def jsonQ(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name subset (fast iteration
    // on new queries without paying for the whole inventory)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = graft.core.GraftSession.local()
    new java.io.File(outDir).mkdirs()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val work = selected.map { case (name, fn) =>
      Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          // A failed query must produce a RED row, never a missing one
          // (round-4 lesson: 41 analysis failures read as "84/84 green").
          // The marker survives in the query's output dir where both
          // selfcheck.py and a human will look first.
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          val d = new java.io.File(s"$outDir/$name"); d.mkdirs()
          val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(2000)}"
          Files.writeString(Paths.get(s"$outDir/$name/_ERROR.json"),
            s"""{"query": ${jsonQ(name)}, "err": ${jsonQ(msg)}}""")
        }
      }
    }
    Await.result(Future.sequence(work), Duration.Inf)
    pool.shutdown()
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${jsonQ(k)}: ${jsonQ(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full declared-query inventory, so a checker can distinguish "query
    // has no oracle (rows-only check)" from "query silently vanished".
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      selected.map(_._1).sorted.map(jsonQ).mkString("[", ",", "]"))
    // Iterative (non-recursive) oracle formulations for the queries whose
    // recursive-CTE oracles are sf1-infeasible in DuckDB — selfcheck.py
    // switches to these when a wall cap is in force (see
    // LlmQueries.ccIterPairsSql). The SQL is authored next to the
    // recursive forms it mirrors; this file is just the transport.
    val iter = graft.llm.LlmQueries
    def obj(m: Map[String, String]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"${jsonQ(k)}: ${jsonQ(v)}" }
        .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_iter.json"),
      s"""{"pairs": ${jsonQ(iter.ccIterPairsSql)}, """ +
        s""""loop": ${obj(iter.ccIterLoop)}, """ +
        s""""finals": ${obj(iter.ccIterFinals.filter { case (k, _) =>
          only.forall(_.contains(k)) })}, "max_rounds": 200}""")
    spark.stop()
  }
}
