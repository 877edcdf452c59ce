package graft.operators

import graft.SparkTestBase

class LabelPropagationSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val session = spark
    import session.implicits._
    LabelPropagation.run(edges.toDF("u", "v"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side reference: synchronous majority vote, (cnt desc, label
    * asc) tie-break, labels start as node ids. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val adj = sym.groupMap(_._1)(_._2)
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(labels).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("two triangles joined by a bridge settle into two communities") {
    // triangle A {1,2,3}, triangle B {10,11,12}, bridge 3-10
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val got = run(e, 3)
    assert(got === reference(e, 3))
    // each triangle is internally uniform after convergence-ish rounds;
    // the bridge's single vote never overturns a triangle majority
    assert(got(1) === got(2))
    assert(got(10) === got(11) && got(11) === got(12))
    assert(got(1) !== got(12))
  }

  test("tie votes resolve to the smallest label (deterministic)") {
    // path 1-2-3: node 2 sees one vote each from labels 1 and 3 → picks 1
    val got = run(Seq((1L, 2L), (2L, 3L)), 1)
    assert(got(2) === 1L)
    assert(got === reference(Seq((1L, 2L), (2L, 3L)), 1))
  }

  test("random graphs match the driver-side synchronous reference (ScalaCheck)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val genEdges = Gen.chooseNum(1, 30).flatMap(m =>
      Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L))))
    val prop = forAll(genEdges) { raw =>
      val es = raw.collect { case (a, b) if a != b => (a, b) }.distinct
      es.isEmpty || run(es, 3) == reference(es, 3)
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(15))
    assert(r.passed, r.status.toString)
  }
}
