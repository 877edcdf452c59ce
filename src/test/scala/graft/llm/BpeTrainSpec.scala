package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

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

  test("mergeBatch fold is greedy left-to-right incl. adjacent repeats") {
    val session = spark
    import session.implicits._
    val in = Seq("a b a b", "a a a a a", "b a b a b", "x", "a b c a b")
      .toDF("toks")
    val out = in.select(BpeTrainer.mergeBatch($"toks", Seq(("a", "b"))).as("m"))
      .as[String].collect().toSeq
    // ' a b a b ' merges BOTH pairs (the replace(' a b ') form only got one)
    assert(out == Seq("ab ab", "a a a a a", "b ab ab", "x", "ab c ab"))
    val aa = in.select(BpeTrainer.mergeBatch($"toks", Seq(("a", "a"))).as("m"))
      .as[String].collect().toSeq
    // greedy positions for a==b: (1,2)(3,4) merge, 5th survives — and the
    // 'aa' just produced never re-merges with the following 'a'
    assert(aa(1) == "aa aa a")
    // a batch of mutually text-disjoint pairs applies in one fold, equal to
    // applying the merges one after another (disjoint symbols can't interact)
    val two = Seq("a b c d a b", "c d c d", "a c d b")
      .toDF("toks")
      .select(BpeTrainer.mergeBatch($"toks", Seq(("a", "b"), ("c", "d"))).as("m"))
      .as[String].collect().toSeq
    assert(two == Seq("ab cd ab", "cd cd", "a cd b"))
  }

  test("batched strict training ≡ sequential gold (all 64 merges)") {
    val session = spark
    import session.implicits._
    val words = BpeTrainer.wordDict(session, sf).localCheckpoint()
    // local gold: same word-frequency dict, pure-Scala sequential trainer
    val wf = words.select($"toks", $"freq").as[(String, Long)].collect()
      .toSeq.map { case (t, f) => (t.split(" ").mkString, f) }
    val gold = BpeTrainer.trainLocal(wf, 64)
    assert(gold.length == 64, "test data must support 64 merges")
    val (batched, _) = BpeTrainer.trainBatched(words, 64, maxBatch = 128)
    assert(batched == gold,
      s"strict batched diverged from sequential at ${
        batched.zip(gold).indexWhere(p => p._1 != p._2)}")
    // bpe2 (the 3-step oracle query) is the same trainer at batch size 1
    val bpe2 = IndexQueries.bpe2(session, sf)
      .as[(Long, String, String, String, Long)].collect().toVector
      .map(r => BpeTrainer.Merge(r._1, r._2, r._3, r._4, r._5))
    assert(bpe2 == gold.take(3))
  }

  test("production config: 64 merges in ≤16 jobs, first 3 ≡ sequential") {
    val session = spark
    val words = BpeTrainer.wordDict(session, sf).localCheckpoint()
    // relaxed batching with a 3-merge sequential warmup: the warmup is
    // bit-exact by construction; after it, conflicting candidates are
    // skipped (not halted on), so batches stay wide — on natural text the
    // top pairs share symbols and strict batching degenerates to ~1
    // accept/pass (57 passes for these 64 merges)
    val (relaxed, passes) = BpeTrainer.trainBatched(words, 64, maxBatch = 128,
      strict = false, warmup = 3)
    assert(relaxed.length == 64)
    assert(passes <= 64 / 4, s"expected ≤16 pair-count jobs, took $passes")
    val (seq3, _) = BpeTrainer.trainBatched(words, 3, maxBatch = 1)
    assert(relaxed.take(3) == seq3)
    // every merge composes from single chars or previously built tokens
    val vocab = collection.mutable.Set[String]()
    relaxed.foreach { m =>
      assert(m.lhs.length == 1 || vocab.contains(m.lhs))
      assert(m.rhs.length == 1 || vocab.contains(m.rhs))
      vocab += m.merged
    }
  }
}
