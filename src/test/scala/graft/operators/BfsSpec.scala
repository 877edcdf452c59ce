package graft.operators

import graft.SparkTestBase

class BfsSpec extends SparkTestBase {

  test("levels assigns min hop distance; depth bound and early stop hold") {
    import spark.implicits._
    // path 1-2-3-4-5 (undirected => symmetrize), plus disconnected 10-11
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val sym = e.union(e.select($"b".as("a"), $"a".as("b")))
    val src = Seq(1L).toDF("v")

    val lv2 = Bfs.levels(sym, src, maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(lv2 === Map(1L -> 0, 2L -> 1, 3L -> 2)) // depth-bounded

    val lvAll = Bfs.levels(sym, src, maxDepth = 99)
      .as[(Long, Int)].collect().toMap // early stop: frontier dries at d=4
    assert(lvAll === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(!lvAll.contains(10L) && !lvAll.contains(11L))
  }

  test("multi-source: a node gets the level of its NEAREST source") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L)).toDF("a", "b")
    val sym = e.union(e.select($"b".as("a"), $"a".as("b")))
    val lv = Bfs.levels(sym, Seq(1L, 5L).toDF("v"), maxDepth = 3)
      .as[(Long, Int)].collect().toMap
    assert(lv === Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }
}
