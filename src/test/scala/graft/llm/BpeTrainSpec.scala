package graft.llm

import graft.SparkTestBase

class BpeTrainSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bpe2 merges are monotone in count and composed of prior vocabulary") {
    val session = spark
    import session.implicits._
    val merges = IndexQueries.bpe2(session, sf)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(merges.length == 3)
    // a later merge can never be MORE frequent than an earlier one: the
    // earlier argmax already saw every pair the later step sees, except
    // pairs created by its own merge — which are sub-spans of the winner
    // and so bounded by its count
    assert(merges.sliding(2).forall { case Array(a, b) => a._5 >= b._5; case _ => true })
    // each merge's sides are single chars or previously-built tokens
    val vocab = collection.mutable.Set[String]()
    merges.foreach { case (_, l, r, m, _) =>
      assert(l.length == 1 || vocab.contains(l), s"unknown lhs $l")
      assert(r.length == 1 || vocab.contains(r), s"unknown rhs $r")
      assert(m == l + r)
      vocab += m
    }
  }
}
