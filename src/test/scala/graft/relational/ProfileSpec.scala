package graft.relational

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {

  test("profile counts nulls, distincts and the exact top value per column") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), Some(2)), (Some("b"), None),
      (None, Some(2)), (None, None), (Some("a"), Some(2))
    ).toDF("s", "i")
    val rows = Extras.profile(df, Seq("s", "i"))
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().sortBy(_._1)
    val (iName, iN, iNull, iDist, iTop, iTopN) = rows(0)
    assert(iName == "i" && iN == 6 && iNull == 2 && iDist == 2)
    assert(iTop.contains("2") && iTopN.contains(3L))
    val (sName, sN, sNull, sDist, sTop, sTopN) = rows(1)
    assert(sName == "s" && sN == 6 && sNull == 2 && sDist == 2)
    assert(sTop.contains("a") && sTopN.contains(3L))
  }

  test("profile of an all-null column yields a NULL top value") {
    val session = spark
    import session.implicits._
    val df = Seq.fill(3)(Option.empty[String]).toDF("s")
    val r = Extras.profile(df, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().head
    assert(r == (("s", 3L, 3L, 0L, None, None)))
  }

  test("top-value ties break toward the larger value string on both engines") {
    val session = spark
    import session.implicits._
    // 2×"x", 2×"y" — tie; max(struct(cnt, v)) picks "y", as does the
    // oracle's ORDER BY cnt DESC, v DESC
    val df = Seq("x", "x", "y", "y").toDF("s")
    val r = Extras.profile(df, Seq("s")).collect().head
    assert(r.getString(4) == "y" && r.getLong(5) == 2L)
  }
}
