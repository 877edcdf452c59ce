package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class SkylineSpec extends SparkTestBase {

  /** Brute-force O(n²) oracle: strict-dominance survivors (as a predicate
    * over the distinct point set). */
  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }.toSet

  private def run(pts: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val session = spark
    import session.implicits._
    Skyline.pareto2D(pts.toDF("x", "y").repartition(5), col("x"), col("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
  }

  test("hand case: staircase front with an interior duplicate pair") {
    // front: (5,1); (4,0) and its duplicate; (3,2) is dominated by (5,1)
    val pts = Seq((5.0, 1.0), (4.0, 0.0), (4.0, 0.0), (3.0, 2.0), (2.0, 5.0))
    assert(run(pts).sorted === Seq((4.0, 0.0), (4.0, 0.0), (5.0, 1.0)))
  }

  test("dominated equal-x and equal-y points drop; frontier duplicates survive") {
    assert(run(Seq((5.0, 2.0), (5.0, 3.0))).toSet === Set((5.0, 2.0)))
    assert(run(Seq((5.0, 2.0), (4.0, 2.0))).toSet === Set((5.0, 2.0)))
    assert(run(Seq((5.0, 2.0), (5.0, 2.0))).length === 2)
  }

  test("random point sets match the brute-force dominance oracle (ScalaCheck)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val coord = Gen.chooseNum(0, 20).map(_.toDouble)
    val points = Gen.listOfN(60, Gen.zip(coord, coord))
    val prop = forAll(points) { pts =>
      pts.isEmpty || {
        // multiset equality: duplicates of front points must all survive
        val want = pts.filter(brute(pts))
        run(pts).sorted == want.sorted
      }
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(r.passed, r.status.toString)
  }
}
