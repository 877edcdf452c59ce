package graft.llm

import graft.SparkTestBase
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** cdk1 content-defined chunking: semantics pinned by a local recompute,
  * and the property that justifies CDC over fixed segmentation — chunking
  * RESYNCHRONIZES after an insertion (only chunks within the rolling
  * window of the edit change; ld1's aligned segments all shift). */
class ChunkingSpec extends SparkTestBase {

  private val W = 4
  private val D = 8

  private def tokC(tok: String): Long =
    tok.zipWithIndex.map { case (ch, j) => ch.toInt.toLong * (j + 1) }.sum

  /** (boundary positions, chunk texts) for one token list — the reference
    * mirror of cdk1's rolling-hash rule (1-based positions, boundary
    * AFTER position i). */
  private def chunk(toks: IndexedSeq[String]): (Seq[Int], Seq[String]) = {
    val cs = toks.map(tokC)
    def cAt(i: Int): Long = if (i >= 1 && i <= cs.length) cs(i - 1) else 0L
    val bs = (1 to toks.length).filter { i =>
      i >= W && (11 * cAt(i) + 7 * cAt(i - 1) + 5 * cAt(i - 2) + 3 * cAt(i - 3)) % D == 0
    }
    val starts = 1 +: bs.map(_ + 1).filter(_ <= toks.length)
    val ends = bs ++ Seq(toks.length)
    val texts = starts.zip(ends).collect {
      case (a, b) if a <= b => toks.slice(a - 1, b).mkString(" ")
    }
    (bs, texts)
  }

  test("cdk1 matches a local rolling-hash recompute at sf0.001") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toIndexedSeq)
      .toMap
    val allChunks = docs.toSeq.flatMap { case (id, toks) => chunk(toks)._2.map((id, _)) }
    val occ = allChunks.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = docs.map { case (id, toks) =>
      val texts = chunk(toks)._2
      id -> (texts.size.toLong, texts.count(occ(_) > 1).toLong)
    }
    val rows = QualityQueries.cdk1(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nd) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_chunks") == nc, s"doc ${r.getLong(0)} n_chunks")
      assert(r.getAs[Long]("n_dup_chunks") == nd, s"doc ${r.getLong(0)} n_dup_chunks")
    }
    // boundaries must actually fire on this corpus (expected chunk ≈ D tokens)
    assert(rows.map(_.getAs[Long]("n_chunks")).max > 1)
  }

  test("chunking resynchronizes after a single-token insertion") {
    val vocab = Seq("scan", "join", "table", "query", "row", "agg", "sort", "key")
    val gen = for {
      toks <- Gen.listOfN(40, Gen.oneOf(vocab))
      k <- Gen.chooseNum(1, 39)
      ins <- Gen.oneOf(vocab)
    } yield (toks.toIndexedSeq, k, ins)
    val prop = forAll(gen) { (t: (IndexedSeq[String], Int, String)) =>
      val (toks, k, ins) = t
      val mutated = (toks.take(k) :+ ins) ++ toks.drop(k)
      val (bs0, ch0) = chunk(toks)
      val (bs1, ch1) = chunk(mutated)
      // every original boundary whose window sits fully past the insertion
      // survives (shifted by one) — so the chunk streams after the first
      // such boundary are identical
      bs0.find(_ >= k + W) match {
        case None => true // edit near the tail: nothing required to survive
        case Some(b) =>
          val tail0 = ch0.drop(bs0.count(_ <= b))
          val tail1 = ch1.drop(bs1.count(_ <= b + 1))
          bs1.contains(b + 1) && tail0 == tail1
      }
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(300))
    assert(r.passed, r.status.toString)
  }
}
