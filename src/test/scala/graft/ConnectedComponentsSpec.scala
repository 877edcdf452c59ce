package graft

import graft.operators.ConnectedComponents
import org.scalacheck.Gen

class ConnectedComponentsSpec extends SparkTestBase {

  /** Reference union-find on the driver. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize roots to the component min
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }.toMap
  }

  private def sparkComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two triangles joined by a bridge collapse to one component") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L))
    val got = sparkComponents(edges)
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
  }

  test("disjoint pairs stay separate components with min-id roots") {
    val got = sparkComponents(Seq((5L, 9L), (2L, 7L), (100L, 42L)))
    assert(got === Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L, 100L -> 42L, 42L -> 42L))
  }

  test("long path converges (propagation needs O(diameter) rounds)") {
    val edges = (0L until 15L).map(i => (i, i + 1))
    val got = sparkComponents(edges)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 16)
  }

  test("random graphs match driver-side union-find") {
    val genEdges = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1); b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2)
    // a handful of sampled graphs (each run is a full Spark iteration loop)
    val samples = Iterator.continually(genEdges.sample).flatten.take(5).toList
    samples.foreach { es =>
      if (es.nonEmpty) assert(sparkComponents(es) === ufComponents(25, es), s"edges=$es")
    }
  }

  test("clusters() assigns isolated docs their own id") {
    import spark.implicits._
    val pairs = Seq((1L, 2L)).toDF("da", "db")
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val got = ConnectedComponents.clusters(spark, pairs, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
