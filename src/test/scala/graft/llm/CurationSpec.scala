package graft.llm

import graft.SparkTestBase
import graft.core.Tables

class CurationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("curate = documents minus the union of stage drop lists") {
    val total = Tables.documents(spark, dir).count()
    val kept = Curation.curate(spark, dir)
    val keptN = kept.count()
    assert(keptN > 0 && keptN <= total)

    // set semantics: kept ∩ (any drop list) = ∅, and every excluded doc is
    // in at least one drop list
    val dropUnion = Seq(
      Curation.evalHoldoutDrops(spark, dir),
      Curation.repetitionDrops(spark, dir), Curation.qualityDrops(spark, dir),
      Curation.nearDupDrops(spark, dir), Curation.contaminationDrops(spark, dir))
      .reduce(_ unionByName _).distinct()
    assert(kept.join(dropUnion, Seq("doc_id"), "left_semi").count() === 0L)
    assert(keptN === total - dropUnion.count())
    // the training export must never contain the held-out eval set
    assert(kept.filter(kept("doc_id") % 10 === 0).count() === 0L)
  }

  test("report stages partition the dropped set and end at the kept count") {
    val total = Tables.documents(spark, dir).count()
    val rep = Curation.report(spark, dir)
    assert(rep.map(_.stage) ===
      Seq("eval_holdout", "repetition", "lm_quality", "near_dup", "decontamination"))
    // sequential accounting: remaining decreases monotonically to kept
    rep.foldLeft(total) { (prev, r) =>
      assert(r.remaining === prev - r.dropped)
      assert(r.dropped >= 0)
      r.remaining
    }
    assert(rep.last.remaining === Curation.curate(spark, dir).count())
  }

  test("curateAndExport writes shards that round-trip to the kept corpus") {
    val out = tmpDir("curation-export").toString
    val n = Curation.curateAndExport(spark, dir, out, numShards = 3)
    val back = spark.read.json(out)
    assert(back.count() === n)
    assert(back.select("doc_id").distinct().count() === n)
  }
}
