package graft.relational

import graft.SparkTestBase

class TemporalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("ts1 gap-fill: dense per-user calendar, LOCF carries the last observation") {
    val session = spark
    import session.implicits._
    val rows = Temporal.ts1(session, sf)
      .as[(Long, String, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val days = series.map(_._2).sorted
      // dense: every day between first and last observation is present
      val d0 = java.time.LocalDate.parse(days.head)
      val d1 = java.time.LocalDate.parse(days.last)
      assert(days.length == java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1)
      assert(days.distinct.length == days.length)
      // endpoints are observations, and a gap day repeats the value of the
      // most recent non-gap day
      val sorted = series.sortBy(_._2)
      assert(!sorted.head._4 && !sorted.last._4)
      sorted.sliding(2).foreach {
        case Array((_, _, prev, _), (_, _, v, isGap)) =>
          if (isGap) assert(v == prev)
        case _ =>
      }
    }
  }

}
