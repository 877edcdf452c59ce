package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BloomSemiJoinSpec extends SparkTestBase {

  test("semiJoin equals the exact left-semi join") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i % 701, i)).toDF("k", "id")
    val keys = (0L to 700L by 7).toDF("key") // 1/7 of the key space
    val got = BloomSemiJoin.semiJoin(fact, $"k", keys, $"key", expectedItems = 128)
      .select($"id").as[Long].collect().sorted
    val want = fact.join(keys, $"k" === $"key", "left_semi")
      .select($"id").as[Long].collect().sorted
    assert(got === want)
  }

  test("prefilter is a superset of the exact match and thins at the fpp") {
    import spark.implicits._
    val fact = (1L to 20000L).map(i => (i % 9973, i)).toDF("k", "id")
    val keys = (0L to 9973L by 100).toDF("key") // ~1% of the key space
    val pre = BloomSemiJoin.prefilter(fact, $"k", keys, $"key",
      expectedItems = 128, fpp = 0.03).count()
    val exact = fact.join(keys, $"k" === $"key", "left_semi").count()
    assert(pre >= exact) // no false negatives, ever
    // false-positive budget: non-matching rows kept should be ~fpp; allow 4x
    val nonMatching = 20000L - exact
    assert(pre - exact <= (nonMatching * 0.03 * 4).toLong)
  }

  test("probe expression agrees between codegen and interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    val keys = (1L to 50L).map(_ * 3).toDF("key")
    val bloom = keys.stat.bloomFilter($"key", 64, 0.01)
    val df = (1L to 150L).toDF("x")
    val c = GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression($"x"), bloom))
    val viaPlan = df.filter(c).as[Long].collect().toSet
    val viaEval = (1L to 150L).filter(bloom.mightContainLong).toSet
    assert(viaPlan === viaEval)
    assert((1L to 50L).map(_ * 3).toSet.subsetOf(viaPlan))
  }
}
