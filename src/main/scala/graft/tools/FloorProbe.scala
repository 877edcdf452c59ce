package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._

/** Decomposition of the per-query JOB FLOOR — the flat ~0.2–0.5 s a
  * sub-second query pays at local[32] regardless of data size. The floor
  * is ~2/3 of the matched ORACLE_BENCH total (200+ sub-second queries ×
  * the constant), so this probe measures where it lives and whether any
  * safe conf moves it:
  *
  *  - per query, fresh-plan wall splits into PLAN (analysis + optimization
  *    + physical planning, forced via queryExecution.executedPlan) and
  *    EXECUTE (collect on the already-planned frame);
  *  - a listener counts jobs/stages/tasks and sums executor task runtime,
  *    so EXECUTE further splits into parallel task work
  *    (sumTaskRuntime / slots) and everything that is not task work —
  *    job launch, stage submit, AQE stage materialization barriers, task
  *    dispatch — the scheduling share;
  *  - conf arms, interleaved in one JVM (all runtime-settable): AQE on/off
  *    and shuffle.partitions 32/8 — the two dials the r9 verdict asked to
  *    test for sub-second inputs.
  *
  * Usage: runMain graft.tools.FloorProbe <sfDir> [rounds=5] [q1,q2,...]
  */
object FloorProbe {

  private class Counts extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskRunMs = new AtomicLong
    val taskDeserMs = new AtomicLong
    val gcMs = new AtomicLong
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) {
        taskRunMs.addAndGet(m.executorRunTime)
        taskDeserMs.addAndGet(m.executorDeserializeTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      taskRunMs.set(0); taskDeserMs.set(0); gcMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "x1_powerlaw_psd", "m1_binary_meta", "s8_covariance_roundtrip",
      "a4_model_counts", "a14_distinct_backends"))
    val spark = graft.core.GraftSession.local()
    val slots = graft.core.GraftSession.cpus
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    case class Arm(tag: String, aqe: Boolean, sp: Int)
    val arms = Seq(Arm("aqe+sp32", aqe = true, 32), Arm("noaqe+sp32", aqe = false, 32),
      Arm("aqe+sp8", aqe = true, 8), Arm("noaqe+sp8", aqe = false, 8))

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).collect() // warm: codegen cache + page cache + memos
      case class Sample(plan: Double, exec: Double, jobs: Int, stages: Int,
        tasks: Int, runMs: Long, deserMs: Long, gcMs: Long) {
        def total: Double = plan + exec
      }
      def sample(): Sample = {
        // settle listener events from the previous run before resetting
        org.apache.spark.sql.GraftSqlBridge.waitForListenerBus(spark)
        counts.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.executedPlan // force analysis→physical planning
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        org.apache.spark.sql.GraftSqlBridge.waitForListenerBus(spark)
        Sample((t1 - t0) / 1e9, (t2 - t1) / 1e9, counts.jobs.get,
          counts.stages.get, counts.tasks.get, counts.taskRunMs.get,
          counts.taskDeserMs.get, counts.gcMs.get)
      }
      val best = collection.mutable.Map.empty[String, Sample]
      (1 to rounds).foreach { _ =>
        arms.foreach { a =>
          spark.conf.set("spark.sql.adaptive.enabled", a.aqe.toString)
          spark.conf.set("spark.sql.shuffle.partitions", a.sp.toString)
          val s = sample()
          if (!best.get(a.tag).exists(_.total <= s.total)) best(a.tag) = s
        }
      }
      // restore session defaults before the next query
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      arms.foreach { a =>
        val s = best(a.tag)
        val work = s.runMs / 1000.0 / slots
        val sched = math.max(0.0, s.exec - work)
        println(f"[floor] $name ${a.tag}%-11s total=${s.total}%.3f plan=${s.plan}%.3f " +
          f"exec=${s.exec}%.3f (taskwork/slot=$work%.3f sched=$sched%.3f) " +
          f"jobs=${s.jobs} stages=${s.stages} tasks=${s.tasks} " +
          f"taskrun=${s.runMs}ms deser=${s.deserMs}ms gc=${s.gcMs}ms")
      }
    }
    spark.stop()
  }
}
