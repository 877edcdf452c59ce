package graft.llm

import graft.SparkTestBase
import graft.core.Tables
import graft.sinks.CorpusExport

/** tm1 (training manifest) and ev1 (embedding moments) against local gold
  * recomputes at sf0.001, plus the writeOrderedShards sink whose on-disk
  * layout must agree with the tm1 manifest row for row. */
class ManifestMomentsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** (doc_id, tok) in the Knuth-hash global order tm1 ranks by. */
  private def orderedDocs(): Array[(Long, Long)] =
    Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ").count(_.nonEmpty).toLong
        (r.getLong(0), toks)
      }
      .sortBy { case (id, _) => ((id * 2654435761L) % 4294967296L, id) }

  test("tm1: shards partition the ordered corpus into contiguous 64-doc runs") {
    val gold = orderedDocs()
    val rows = CorpusQueries.tm1(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === gold.length.toLong) // n_docs total
    val nShards = (gold.length + 63) / 64
    assert(rows.length === nShards)
    for ((r, sid) <- rows.zipWithIndex) {
      val shardGold = gold.slice(sid * 64, math.min((sid + 1) * 64, gold.length))
      assert(r.getLong(0) === sid.toLong)
      assert(r.getLong(1) === shardGold.length.toLong, s"n_docs shard $sid")
      assert(r.getLong(2) === shardGold.map(_._2).sum, s"n_tokens shard $sid")
      assert(r.getLong(3) === sid * 64L + 1L, s"min_rank shard $sid")
      assert(r.getLong(4) === sid * 64L + shardGold.length, s"max_rank shard $sid")
      assert(r.getLong(5) === shardGold.head._1, s"first_doc shard $sid")
      assert(r.getLong(6) === shardGold.last._1, s"last_doc shard $sid")
    }
  }

  test("writeOrderedShards: one dir per shard, rank-sorted rows, manifest parity") {
    val docs = Tables.documents(spark, dir)
    val out = tmpDir("ordered-shards").toString
    val written = CorpusExport.writeOrderedShards(docs, out, "doc_id", 64L)
    assert(written === docs.count())

    val manifest = CorpusQueries.tm1(spark, dir).collect()
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === manifest.map(r => s"shard_id=${r.getLong(0)}").sorted.toSeq)

    for (m <- manifest.take(3)) {
      val sid = m.getLong(0)
      val shard = spark.read.parquet(s"$out/shard_id=$sid")
        .select("doc_id", "__rank").collect()
      assert(shard.length === m.getLong(1), s"shard $sid row count")
      // the on-file row order IS the training order: ranks strictly increase
      val ranks = shard.map(_.getLong(1))
      assert(ranks.toSeq === ranks.sorted.toSeq, s"shard $sid not rank-sorted")
      assert(ranks.head === m.getLong(3) && ranks.last === m.getLong(4))
      assert(shard.head.getLong(0) === m.getLong(5), s"shard $sid first_doc")
      assert(shard.last.getLong(0) === m.getLong(6), s"shard $sid last_doc")
    }
  }

  test("mf1: digest matches a local recompute, is order-sensitive, partition-invariant") {
    val gold = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, _) => ((id * 2654435761L) % 4294967296L, id) }
    val rows = CorpusQueries.mf1(spark, dir).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((r, sid) <- rows.zipWithIndex) {
      val shard = gold.slice(sid * 64, math.min((sid + 1) * 64, gold.length))
      val want = md.digest(shard.map(_._2).mkString("\u0001")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(2) === want, s"content_md5 shard $sid")
    }
    // swapping any two adjacent docs' ranks would change the digest — the
    // digest is ORDER-sensitive, not just content-sensitive
    val s0 = gold.take(2)
    if (s0.length == 2 && s0(0)._2 != s0(1)._2) {
      val fwd = md.digest((s0(0)._2 + "\u0001" + s0(1)._2).getBytes("UTF-8"))
      val rev = md.digest((s0(1)._2 + "\u0001" + s0(0)._2).getBytes("UTF-8"))
      assert(!fwd.sameElements(rev))
    }
  }

  test("curateToTrainingShards: shards + manifest agree with disk, re-run is byte-identical") {
    val out1 = tmpDir("release-1").toString
    val man1 = Curation.curateToTrainingShards(spark, dir, out1).collect()
    val dirs = new java.io.File(out1).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq === man1.map(r => s"shard_id=${r.getLong(0)}").sorted.toSeq)
    // disk agrees with the manifest: counts per shard, and the digest of
    // the on-file text in __rank order
    val md = java.security.MessageDigest.getInstance("MD5")
    for (m <- man1.take(2)) {
      val rows = spark.read.parquet(s"$out1/shard_id=${m.getLong(0)}")
        .select("__rank", "text").collect().sortBy(_.getLong(0))
      assert(rows.length === m.getLong(1))
      val got = md.digest(rows.map(_.getString(1)).mkString("\u0001")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got === m.getString(7), s"digest shard ${m.getLong(0)}")
    }
    // reproducibility: a second release run emits the identical manifest
    val man2 = Curation.curateToTrainingShards(spark, dir,
      tmpDir("release-2").toString).collect()
    assert(man1.map(_.toSeq).toSeq === man2.map(_.toSeq).toSeq)
  }

  test("ev1: moments match an exact integer-space local recompute") {
    val vecs = Tables.embeddings(spark, dir).select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val gold = vecs.flatMap { case (lab, e) =>
      e.zipWithIndex.map { case (v, d) =>
        val sv = BigDecimal(v.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        ((lab, d.toLong), sv)
      }
    }.groupBy(_._1).map { case (k, xs) =>
      val svs = xs.map(_._2)
      val n = svs.length.toLong
      val s1 = svs.sum
      val s2 = svs.map(x => x * x).sum
      val mean = (s1.toDouble / n.toDouble) / 1e6
      val vp = (s2.toDouble / n.toDouble -
        (s1.toDouble / n.toDouble) * (s1.toDouble / n.toDouble)) / 1e12
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      k -> (n, r6(mean), r6(vp))
    }
    val rows = LlmQueries.ev1(spark, dir).collect()
    assert(rows.length === gold.size)
    for (r <- rows) {
      val (n, mean, vp) = gold((r.getInt(0), r.getLong(1)))
      assert(r.getLong(2) === n)
      assert(math.abs(r.getDouble(3) - mean) <= 1e-9, s"mean ${r.getInt(0)}/${r.getLong(1)}")
      assert(math.abs(r.getDouble(4) - vp) <= 1e-9, s"var ${r.getInt(0)}/${r.getLong(1)}")
      assert(r.getDouble(4) >= 0.0)
    }
  }
}
