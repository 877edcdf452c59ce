package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkTestBase {

  import spark.implicits._

  // 1000 fact rows on a hot key (90%) + a uniform tail — the shape salting
  // exists for.
  private lazy val facts = spark.range(1000)
    .select(
      when($"id" % 10 < 9, lit(7L)).otherwise($"id" % 50).as("k"),
      ($"id" * 3).as("payload"))
  private lazy val dim = spark.range(50)
    .select($"id".as("k"), concat(lit("name_"), $"id").as("name"))

  test("salted join equals the plain join, row for row") {
    val plain = facts.join(dim, "k").select($"k", $"payload", $"name")
    val salted = SaltedJoin.join(facts, dim, "k", salts = 8)
      .select($"k", $"payload", $"name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join widens the join key with the salt column") {
    val salted = SaltedJoin.join(facts, dim, "k", salts = 8)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"expected salted key in:\n$plan")
  }

  test("salt is deterministic across re-evaluation") {
    val a = SaltedJoin.join(facts, dim, "k").agg(sum("payload")).head.getLong(0)
    val b = SaltedJoin.join(facts, dim, "k").agg(sum("payload")).head.getLong(0)
    assert(a === b)
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val direct = facts.groupBy($"k")
      .agg(sum($"payload").as("s"), count(lit(1)).as("n"))
    val salted = SaltedJoin.agg(facts, "k", salts = 8,
      partial = Seq(sum($"payload").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("salted collect_set state is split across salts then merged") {
    val direct = facts.groupBy($"k")
      .agg(size(collect_set($"payload")).as("n_distinct"))
    val salted = SaltedJoin.agg(facts, "k", salts = 8,
        partial = Seq(collect_set($"payload").as("ps")),
        merge = Seq(size(array_distinct(flatten(collect_list($"ps")))).as("n_distinct")))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }
}
