package graft.operators

import graft.SparkTestBase

class TriangleCountSpec extends SparkTestBase {

  private def stats(edges: Seq[(Long, Long)]) = {
    val session = spark
    import session.implicits._
    TriangleCount.run(edges.toDF("u", "v")).head()
  }

  test("K4: 4 triangles, clustering 1.0") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val r = stats(k4)
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 12) // 4 nodes × C(3,2)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Double]("clustering") == 1.0)
  }

  test("path graph: wedges but no triangles") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("n_wedges") == 3)
    assert(r.getAs[Double]("clustering") == 0.0)
  }

  test("triangle with a pendant: exactly one, counted once") {
    // 1-2-3 triangle, 4 hanging off 3 — the pendant creates wedges through
    // node 3 but no extra triangle, and the hub orientation must not
    // double-count the triangle
    val r = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") == 1)
    assert(r.getAs[Long]("n_wedges") == 2 + 3) // nodes 1,2: 1 each; node 3: C(3,2)
  }

  test("two triangles sharing an edge") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") == 2)
  }

  test("orientation is acyclic: skewed star + triangle counts exactly once") {
    // hub 1 with high degree; triangle (1,2,3). Degree orientation directs
    // both triangle edges AWAY from the low-degree endpoints into the hub,
    // wedge work lands on the small nodes, and the count stays exact.
    val star = (4L to 20L).map(i => (1L, i))
    val r = stats(star ++ Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(r.getAs[Long]("n_triangles") == 1)
  }
}
