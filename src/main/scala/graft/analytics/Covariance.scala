package graft.analytics

import breeze.linalg.DenseMatrix

/** Jump-covariance assembly (SURVEY S12/J6/K5; results.py:542-577).
  *
  * Per-pulsar proposal covariances (`cov.npy`, results.py:562) are merged
  * block-diagonally into one matrix over the union parameter list; a
  * parameter already contributed by an earlier pulsar (common/global pars)
  * is EXCLUDED from later blocks — set-intersect then row/col delete
  * (results.py:563-575 → here an index mask, no mutation).
  *
  * Matrices are per-pulsar small (dozens of pars) — driver-side Breeze is
  * the right tool (SURVEY §7.4.3: keep matrices off the shuffle path).
  */
object Covariance {

  case class Block(pars: Seq[String], cov: DenseMatrix[Double])

  /** Drop rows/cols of pars already seen (J6's anti-join). */
  def excludeRepeated(block: Block, seen: Set[String]): Block = {
    val keep = block.pars.zipWithIndex.filterNot { case (p, _) => seen(p) }
    val idx = keep.map(_._2)
    val m = DenseMatrix.tabulate[Double](idx.length, idx.length) { (i, j) =>
      block.cov(idx(i), idx(j))
    }
    Block(keep.map(_._1), m)
  }

  /** Block-diagonal merge over pulsars, in input order. */
  def blockDiag(blocks: Seq[Block]): Block = {
    val filtered = blocks.foldLeft((Seq.empty[Block], Set.empty[String])) {
      case ((acc, seen), b) =>
        val f = excludeRepeated(b, seen)
        (acc :+ f, seen ++ f.pars)
    }._1
    val pars = filtered.flatMap(_.pars)
    val n = pars.length
    val out = DenseMatrix.zeros[Double](n, n)
    var off = 0
    filtered.foreach { b =>
      val k = b.pars.length
      if (k > 0) out(off until off + k, off until off + k) := b.cov
      off += k
    }
    Block(pars, out)
  }

  /** K5: CSV sink with the par index column (covm_all.csv shape). */
  def toCsv(block: Block): String = {
    val header = ("par" +: block.pars).mkString(",")
    val rows = block.pars.zipWithIndex.map { case (p, i) =>
      (p +: (0 until block.pars.length).map(j => block.cov(i, j).toString)).mkString(",")
    }
    (header +: rows).mkString("", "\n", "\n")
  }

  /** S8 companion: parse the CSV back (pd.read_csv(index_col=0) shape). */
  def fromCsv(csv: String): Block = {
    val lines = csv.trim.split("\n")
    val pars = lines.head.split(",").drop(1).toSeq
    val m = DenseMatrix.tabulate[Double](pars.length, pars.length) { (i, j) =>
      lines(i + 1).split(",")(j + 1).toDouble
    }
    Block(pars, m)
  }
}
