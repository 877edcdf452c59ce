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

  test("levelsBipartite matches symmetrize+levels on a bipartite graph") {
    import spark.implicits._
    // left {1,2,3}, right {101,102,103}; 3 disconnected from sources' reach
    // beyond depth; multi-edge (1,101) appears twice — tolerated undeduped
    val e = Seq((1L, 101L), (1L, 101L), (1L, 102L), (2L, 102L), (2L, 103L),
      (3L, 103L)).toDF("a", "b")
    val src = Seq(1L).toDF("v")
    val bip = Bfs.levelsBipartite(e, src, maxDepth = 4)
      .as[(Long, Int)].collect().toMap
    val sym = e.union(e.select($"b".as("a"), $"a".as("b")))
    val gen = Bfs.levels(sym, src, maxDepth = 4)
      .as[(Long, Int)].collect().toMap
    assert(bip === gen)
    assert(bip === Map(1L -> 0, 101L -> 1, 102L -> 1, 2L -> 2, 103L -> 3,
      3L -> 4))
  }

  test("levelsBipartite: early stop, depth bound, and side-local dedup") {
    import spark.implicits._
    val e = Seq((1L, 10L), (2L, 10L), (2L, 20L)).toDF("a", "b")
    val src = Seq(1L).toDF("v")
    // depth bound cuts before 20 is reached
    val lv1 = Bfs.levelsBipartite(e, src, maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(lv1 === Map(1L -> 0, 10L -> 1, 2L -> 2))
    // frontier dries at d=3 (20 reached), well before the 99 bound
    val lvAll = Bfs.levelsBipartite(e, src, maxDepth = 99)
      .as[(Long, Int)].collect().toMap
    assert(lvAll === Map(1L -> 0, 10L -> 1, 2L -> 2, 20L -> 3))
    // OVERLAPPING id spaces: right id 1 is distinct from left id 1 —
    // it must appear at its own (odd) level, not be swallowed by level 0
    val e2 = Seq((1L, 1L)).toDF("a", "b")
    val both = Bfs.levelsBipartite(e2, src, maxDepth = 2)
      .as[(Long, Int)].collect().toSet
    assert(both === Set((1L, 0), (1L, 1)))
  }
}
