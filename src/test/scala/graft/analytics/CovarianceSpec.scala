package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import breeze.linalg.DenseMatrix
import Covariance._

class CovarianceSpec extends AnyFunSuite {

  private val b1 = Block(Seq("p1", "shared"),
    DenseMatrix((1.0, 0.1), (0.1, 2.0)))
  private val b2 = Block(Seq("shared", "p2"),
    DenseMatrix((9.0, 0.5), (0.5, 3.0)))

  test("repeated pars excluded from later blocks (J6)") {
    val merged = blockDiag(Seq(b1, b2))
    assert(merged.pars === Seq("p1", "shared", "p2"))
    assert(merged.cov(0, 0) === 1.0)
    assert(merged.cov(1, 1) === 2.0) // first block's 'shared' wins
    assert(merged.cov(2, 2) === 3.0) // b2 kept only p2
    assert(merged.cov(0, 2) === 0.0) // off-diagonal blocks zero
  }

  test("csv round-trip preserves pars and values (K5/S8)") {
    val merged = blockDiag(Seq(b1, b2))
    val back = fromCsv(toCsv(merged))
    assert(back.pars === merged.pars)
    assert(back.cov === merged.cov)
  }
}
