package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{BloomSemiJoin, PageRank}

/** Graph analytics + runtime-filter queries over the star schema —
  * north-star widening (the reference has no graph operator; a curation
  * pipeline uses rank/centrality to pick canonical documents, and runtime
  * filters are the standard 100 TB star-join device).
  */
object GraphQueries extends graft.core.QueryModule {

  /** pr1: integer-scaled PageRank over the customer–supplier bipartite
    * graph (edge = "customer ordered from supplier"). Node encoding keeps
    * the id spaces disjoint: customer c → 2c, supplier s → 2s+1. Fixed-point
    * µrank arithmetic (PageRank.Scale) makes all three iterations exact, so
    * the long ranks hash-match the oracle bit-for-bit — no float-summation
    * order anywhere.
    */
  def pr1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // RAW joined rows, no upstream distinct: PageRank's single-exchange
    // build dedups exchange-free on its repartition(b) clustering, so an
    // (a, b) distinct here would add a whole lineitem-wide exchange
    // barrier (and run its dedup agg twice through the symmetrisation
    // union) for nothing — measured r10, Lp1Probe `pr1build` in
    // SCALING.md: sf1 5.68 → 4.39 s. Bipartite ids (even customers / odd
    // suppliers) keep a swapped pair from ever colliding with an
    // original, so the in-build dedup is exactly the upstream one.
    val edges = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
    PageRank.run(edges, iters = 3)
      .select($"v".as("node"), $"rank".as("microrank"))
      .orderBy($"node")
  }

  val pr1Sql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |sym AS (SELECT DISTINCT a, b FROM
      |         (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0)),
      |deg AS (SELECT a AS v, COUNT(*) AS deg FROM sym GROUP BY 1),
      |n AS (SELECT COUNT(*) AS cnt FROM deg),
      |r0 AS (SELECT v, deg, 1000000000000 // (SELECT cnt FROM n) AS rank FROM deg),
      |p1 AS (SELECT s.b AS v,
      |         (15 * (1000000000000 // (SELECT cnt FROM n))) // 100
      |         + (85 * SUM(r.rank // r.deg)) // 100 AS rank
      |       FROM sym s JOIN r0 r ON s.a = r.v GROUP BY s.b),
      |r1 AS (SELECT p.v, d.deg, p.rank FROM p1 p JOIN deg d ON p.v = d.v),
      |p2 AS (SELECT s.b AS v,
      |         (15 * (1000000000000 // (SELECT cnt FROM n))) // 100
      |         + (85 * SUM(r.rank // r.deg)) // 100 AS rank
      |       FROM sym s JOIN r1 r ON s.a = r.v GROUP BY s.b),
      |r2 AS (SELECT p.v, d.deg, p.rank FROM p2 p JOIN deg d ON p.v = d.v),
      |p3 AS (SELECT s.b AS v,
      |         (15 * (1000000000000 // (SELECT cnt FROM n))) // 100
      |         + (85 * SUM(r.rank // r.deg)) // 100 AS rank
      |       FROM sym s JOIN r2 r ON s.a = r.v GROUP BY s.b)
      |SELECT v AS node, CAST(rank AS BIGINT) AS microrank FROM p3 ORDER BY node""".stripMargin

  /** bf1: bloom-prefiltered semi join — revenue of lineitems belonging to
    * URGENT orders. The bloom (built over the ~1/5-selectivity urgent
    * order-key set) thins lineitem BELOW its shuffle; the exact semi-join
    * refine removes false positives, so the result equals the plain semi
    * join the oracle runs. Exact-decimal revenue for a stable hash.
    */
  def bf1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.core.Oracle._
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    // static capacity estimate, NOT a count() job: an oversized bloom only
    // costs bits (fpp drops), an extra count action costs a full pass. A
    // real deployment feeds this from table statistics.
    BloomSemiJoin.semiJoin(Tables.lineitem(s, dir), $"l_orderkey",
        urgent, $"o_orderkey", expectedItems = 1L << 20)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        d(sum(money($"l_extendedprice"))).as("revenue"))
      .orderBy($"l_returnflag")
  }

  val bf1Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** tc1: triangle counting with DEGREE-ORIENTED wedge enumeration — the
    * standard distributed algorithm (each undirected edge is directed from
    * its (degree, id)-smaller endpoint, so every triangle is counted
    * exactly once and wedge work per node is bounded by its ORIENTED
    * out-degree, the O(|E|^1.5) guarantee that survives skewed graphs).
    *
    * Graph: the co-supply ADJACENCY graph — per part, consecutive
    * suppliers by id are linked. Deliberately NOT "suppliers sharing any
    * part": on this schema that projection is a complete graph (every
    * supplier pair shares some part — C(n,2) edges, C(n,3) triangles, a
    * quadratic degenerate), while the adjacency form keeps |E| ∝ |ps| and
    * the window that builds it partitions by part (many parts, no
    * single-partition funnel). All counts integer-exact; the clustering
    * coefficient is one double division at the output edge.
    */
  def tc1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // consecutive-supplier links in ONE shuffle: groupBy(part) with a
    // sorted set, pairs zipped array-side — the distinct + window + lead
    // form pays a second full shuffle (distinct partitions by (p,sup),
    // the window re-partitions by p) for the identical edge set (the
    // per-part supplier list is dictionary-sized, never a funnel)
    val e = Tables.lineitem(s, dir)
      .groupBy($"l_partkey")
      .agg(array_sort(collect_set($"l_suppkey")).as("sups"))
      .select(explode(expr(
        """zip_with(slice(sups, 1, size(sups) - 1),
          |         slice(sups, 2, size(sups) - 1),
          |         (a, b) -> struct(a AS u, b AS v))""".stripMargin)).as("e"))
      .select($"e.u", $"e.v").distinct()
    graft.operators.TriangleCount.run(e)
  }

  val tc1Sql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem),
      |nxt AS (SELECT p, sup AS u, LEAD(sup) OVER (PARTITION BY p ORDER BY sup) AS v
      |        FROM ps),
      |e AS (SELECT DISTINCT u, v FROM nxt WHERE v IS NOT NULL),
      |deg AS (SELECT x, COUNT(*) AS d
      |        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      |o AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
      |             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
      |      FROM e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x),
      |tri AS (SELECT COUNT(*) AS n_triangles
      |        FROM o e1 JOIN o e2 ON e1.dst = e2.src
      |             JOIN o e3 ON e1.src = e3.src AND e2.dst = e3.dst),
      |wed AS (SELECT COUNT(*) AS n_nodes,
      |          CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
      |ecnt AS (SELECT COUNT(*) AS n_edges FROM e)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  round(3.0 * n_triangles / n_wedges, 6) AS clustering
      |FROM wed, ecnt, tri""".stripMargin

  /** kc1: bounded-round k-core peel over tc1's co-supply adjacency graph —
    * the peel PROFILE (peeled/remaining per synchronous round) of the
    * standard k-core decomposition, unrolled to [[KcRounds]] rounds on both
    * engines (pr1's bounded-iteration treatment: well-defined and
    * hash-checkable whether or not the fixed point is reached inside the
    * bound; KCoreSpec proves the bounded peel ≡ run-to-fixpoint semantics
    * on graphs that do converge — and this graph converges inside the
    * bound at every tested SF). The threshold is DATA-DERIVED —
    * k = ⌈mean degree⌉ + 1 — because this graph's density grows with
    * scale factor: any fixed k is either vacuous (nothing ever peels) or
    * instantly total at some SF, and a profile that never peels verifies
    * nothing. The mean-degree scalar is one metadata-sized aggregate
    * (table-statistics material in a real deployment), computed with
    * identical exact-integer→one-double-division arithmetic on both
    * engines.
    */
  private val KcRounds = 6
  def kc1(s: SparkSession, dir: String): DataFrame =
    kc1Guard(s, dir, graft.operators.KCore.LocalFinishNodes,
      graft.operators.KCore.LocalFinishEdges)

  /** kc1 with an explicit tail-finish guard geometry — the KcProbe entry
    * (guard overrides travel as parameters, never shared-JVM sys.props). */
  private[graft] def kc1Guard(s: SparkSession, dir: String,
      localNodes: Long, localEdges: Long): DataFrame =
    kc1Shape(s, dir, localNodes, localEdges, sharedBuild = true)

  /** r11 (VERDICT r10 directive 4): `sharedBuild = true` materializes the
    * canonical co-supply edge set and its degree table ONCE. The r10 shape
    * built coSupplyEdges TWICE (the k-derivation degree scalar consumed it,
    * then peelRounds' round-0 checkpoint re-derived the whole
    * lineitem-repartition → window → dedup chain) and paid the SAME
    * edge-wide degree aggregation twice (the threshold scalar and peel
    * round 1). Now the edge checkpoint and the checkpointed degree table
    * feed the scalar AND the peel (ownership of the edge checkpoint
    * transfers to the peel; the degree checkpoint is released here once
    * the peel returns — the profile is driver-side rows by then).
    * Kc1Probe asserts full-profile identity between the shapes. */
  private[graft] def kc1Shape(s: SparkSession, dir: String,
      localNodes: Long, localEdges: Long, sharedBuild: Boolean): DataFrame = {
    import s.implicits._
    if (sharedBuild) {
      val e = coSupplyEdges(s, dir)
        .select($"u".cast("long").as("u"), $"v".cast("long").as("v"))
        .localCheckpoint()
      val deg = graft.operators.KCore.degrees(e).localCheckpoint()
      val d0 = deg.agg(sum($"dg").cast("long").as("s"), count(lit(1)).as("c")).head()
      val k = math.ceil(d0.getLong(0).toDouble / d0.getLong(1).toDouble).toLong + 1
      val profile = graft.operators.KCore.peelRounds(e, k.toInt, rounds = KcRounds,
        nVertices = Some(d0.getLong(1)),
        localNodes = localNodes, localEdges = localEdges,
        inputCheckpointed = true, deg0 = Some(deg))
      org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(deg)
      profile
    } else {
      val e = coSupplyEdges(s, dir)
      val d0 = e.select($"u".as("x")).unionAll(e.select($"v".as("x")))
        .groupBy($"x").agg(count(lit(1)).as("dg"))
        .agg(sum($"dg").cast("long").as("s"), count(lit(1)).as("c")).head()
      val k = math.ceil(d0.getLong(0).toDouble / d0.getLong(1).toDouble).toLong + 1
      // d0's count IS the vertex count — hand it over so the peel doesn't
      // rerun the same edge-wide degree aggregation for its round-0 size
      graft.operators.KCore.peelRounds(e, k.toInt, rounds = KcRounds,
        nVertices = Some(d0.getLong(1)),
        localNodes = localNodes, localEdges = localEdges)
    }
  }

  val kc1Sql: String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs at each
    // reference, and this chain references each level several times — the
    // un-materialized expansion is exponential in the round count
    val head =
      """WITH ps AS MATERIALIZED (SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem),
        |nxt AS MATERIALIZED (SELECT p, sup AS u, LEAD(sup) OVER (PARTITION BY p ORDER BY sup) AS v
        |        FROM ps),
        |e0 AS MATERIALIZED (SELECT DISTINCT u, v FROM nxt WHERE v IS NOT NULL),
        |d0 AS MATERIALIZED (SELECT x, COUNT(*) AS dg
        |       FROM (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |kk AS MATERIALIZED (SELECT CAST(ceil(CAST(SUM(dg) AS DOUBLE)
        |                        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) + 1 AS k FROM d0)""".stripMargin
    val roundsCtes = (1 to KcRounds).map { i =>
      s"""v$i AS MATERIALIZED (SELECT x FROM d${i - 1} WHERE dg >= (SELECT k FROM kk)),
         |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
         |        WHERE u IN (SELECT x FROM v$i) AND v IN (SELECT x FROM v$i)),
         |d$i AS MATERIALIZED (SELECT x, COUNT(*) AS dg
         |        FROM (SELECT u AS x FROM e$i UNION ALL SELECT v FROM e$i) GROUP BY 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    def n(i: Int) = if (i == 0) "(SELECT COUNT(*) FROM d0)" else s"(SELECT COUNT(*) FROM v$i)"
    val rows = (1 to KcRounds).map { i =>
      s"SELECT CAST($i AS BIGINT) AS round, ${n(i - 1)} - ${n(i)} AS n_peeled, ${n(i)} AS n_remaining"
    }.mkString("\n", "\nUNION ALL ", "\nORDER BY round")
    head + roundsCtes + rows
  }

  /** lp1: majority label-propagation communities over the same co-supply
    * chain graph tc1 counts triangles on — 3 synchronous rounds with the
    * (count desc, label asc) deterministic tie-break
    * ([[graft.operators.LabelPropagation]]). Distinct from c1/c2's
    * connected components: majority voting splits a component along its
    * sparse cuts. Output is the full (node, label) map — the table a
    * canonical-document/supplier-grouping step joins on.
    */
  /** The co-supply adjacency chain edge set kc1/lp1 share (tc1 builds the
    * same edges via its own single-shuffle groupBy+zip form): per part,
    * consecutive suppliers by id are linked. ONE exchange feeds both the
    * (p, sup) dedup AND the per-part window (r9, the cf1 device): hash
    * partitioning on p alone satisfies the distinct's (p, sup) clustering
    * and IS the window's required partitioning, where the distinct-induced
    * shape paid a second full exchange between them — measured interleaved
    * one-JVM A/B (Lp1Probe `cosupply` mode, sf1, best-of-5): construction
    * 1.62 → 1.09 s, the one-exchange arm winning every round. The final
    * (u, v) dedup exchange is unavoidable (different key). */
  private def coSupplyEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ps = Tables.lineitem(s, dir)
      .select($"l_partkey".as("p"), $"l_suppkey".as("sup"))
      .repartition($"p")
      .distinct()
    val w = Window.partitionBy($"p").orderBy($"sup")
    ps.withColumn("v", lead($"sup", 1).over(w))
      .filter($"v".isNotNull)
      .select($"sup".as("u"), $"v").distinct()
  }

  def lp1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.LabelPropagation.run(coSupplyEdges(s, dir), rounds = 3)
      .orderBy($"node")
  }

  val lp1Sql: String = {
    val head =
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem),
        |nxt AS (SELECT p, sup AS u, LEAD(sup) OVER (PARTITION BY p ORDER BY sup) AS v
        |        FROM ps),
        |e0 AS (SELECT DISTINCT u, v FROM nxt WHERE v IS NOT NULL),
        |sym AS (SELECT DISTINCT u, v FROM
        |         (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0)),
        |l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)""".stripMargin
    val rounds = (1 to 3).map { i =>
      s"""c$i AS (SELECT s.u, l.label, COUNT(*) AS cnt
         |       FROM sym s JOIN l${i - 1} l ON s.v = l.node GROUP BY 1, 2),
         |l$i AS (SELECT u AS node, label FROM (
         |         SELECT u, label,
         |           ROW_NUMBER() OVER (PARTITION BY u ORDER BY cnt DESC, label) AS rn
         |         FROM c$i) q WHERE rn = 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    head + rounds + "\nSELECT node, label FROM l3 ORDER BY node"
  }

  /** bfs1: multi-source BFS reachability levels over the same bipartite
    * customer–supplier graph as pr1, seeded at nation-0 customers — the
    * depth-bounded traversal primitive the fixpoint family (pr1/lp1/c1)
    * doesn't cover ("what's within k hops of the trusted seed set").
    * Output is the per-level histogram with an id-sum checksum, so the
    * hash check pins every node to its exact hop distance. The graph is
    * bipartite with all sources on the customer side, so this drives
    * [[graft.operators.Bfs.levelsBipartite]]: the edge set stays DIRECTED
    * (no symmetrized double-width checkpoint) and each round probes one
    * direction and anti-joins one side — the generic symmetrize-and-
    * `Bfs.levels` expression of the same query measured 1.9 s vs 1.1 s at
    * sf0.1. Oracle unrolls the 3 rounds as chained CTEs (same device as
    * kc1/lp1).
    */
  def bfs1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NO edge dedup: the per-round frontier distinct already dedups, so an
    // up-front distinct trades a full edge-wide shuffle for a 2.2% smaller
    // probe side (586,871 / 600,000 at sf0.1) — it pays only past ~33%
    // duplication (one shuffle vs maxDepth probe passes over the excess).
    val e0 = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
    val sources = Tables.customer(s, dir)
      .filter($"c_nationkey" === 0).select(($"c_custkey" * 2).as("v"))
    graft.operators.Bfs.levelsBipartite(e0, sources, maxDepth = 3)
      .groupBy($"level")
      .agg(count(lit(1)).as("n_nodes"), sum($"v").as("sum_ids"))
      .orderBy($"level")
  }

  val bfs1Sql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |sym AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      |l0 AS (SELECT DISTINCT c_custkey * 2 AS v FROM customer WHERE c_nationkey = 0),
      |l1 AS (SELECT DISTINCT s.b AS v FROM sym s JOIN l0 ON s.a = l0.v
      |       WHERE s.b NOT IN (SELECT v FROM l0)),
      |l2 AS (SELECT DISTINCT s.b AS v FROM sym s JOIN l1 ON s.a = l1.v
      |       WHERE s.b NOT IN (SELECT v FROM l0 UNION ALL SELECT v FROM l1)),
      |l3 AS (SELECT DISTINCT s.b AS v FROM sym s JOIN l2 ON s.a = l2.v
      |       WHERE s.b NOT IN (SELECT v FROM l0 UNION ALL SELECT v FROM l1
      |                         UNION ALL SELECT v FROM l2)),
      |lv AS (SELECT 0 AS level, v FROM l0 UNION ALL SELECT 1, v FROM l1
      |       UNION ALL SELECT 2, v FROM l2 UNION ALL SELECT 3, v FROM l3)
      |SELECT CAST(level AS INT) AS level, COUNT(*) AS n_nodes,
      |  CAST(SUM(v) AS BIGINT) AS sum_ids
      |FROM lv GROUP BY 1 ORDER BY 1""".stripMargin

  /** mb1: market-basket association rules on the order→brand bipartite
    * projection — support / confidence / lift for co-purchased brand
    * pairs, the curation analogue being "which source×topic combinations
    * co-occur in a shard". Baskets are built ONCE as per-order brand SETS
    * (one shuffle on the order key, map-side-combined collect_set), and
    * every downstream — order count, brand supports, the C(brands,2)
    * pair stream — reads that same exchange: the pair stage is a chained
    * double explode of the basket array (codegen'd Generate, bounded by
    * basket size), not a bask×bask self-join. The previous distinct
    * (ok, b) formulation partitioned on the PAIR, so its pair self-join
    * re-shuffled both sides on ok — two extra edge-wide exchanges.
    * Brand supports are a dictionary-sized relation and broadcast back
    * onto the pairs.
    */
  def mb1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bask = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("b"))
      .groupBy($"ok").agg(collect_set($"b").as("bs"))
    val nb = bask.agg(count(lit(1)).as("n"))
    val supp = bask.select(explode($"bs").as("b"))
      .groupBy($"b").agg(count(lit(1)).as("s"))
    val pairs = bask.select(explode($"bs").as("brand_a"), $"bs")
      .select($"brand_a", explode($"bs").as("brand_b"))
      .filter($"brand_a" < $"brand_b")
      .groupBy($"brand_a", $"brand_b").agg(count(lit(1)).as("supp_ab"))
    graft.core.ScalarSub.withScalars(
        pairs
          .join(broadcast(supp.toDF("brand_a", "sa")), "brand_a")
          .join(broadcast(supp.toDF("brand_b", "sb")), "brand_b"), nb)
      .filter($"supp_ab" >= 10)
      .select($"brand_a", $"brand_b", $"supp_ab",
        round($"supp_ab".cast("double") / $"sa", 9).as("conf"),
        round($"supp_ab".cast("double") * $"n" / ($"sa" * $"sb"), 9).as("lift"))
      .orderBy($"brand_a", $"brand_b")
  }

  val mb1Sql: String =
    """WITH bask AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT COUNT(DISTINCT ok) AS n FROM bask),
      |supp AS (SELECT b, COUNT(*) AS s FROM bask GROUP BY 1),
      |pairs AS (SELECT a.b AS brand_a, c.b AS brand_b, COUNT(*) AS supp_ab
      |          FROM bask a JOIN bask c ON a.ok = c.ok AND a.b < c.b
      |          GROUP BY 1, 2)
      |SELECT brand_a, brand_b, supp_ab,
      |  round(CAST(supp_ab AS DOUBLE) / sa.s, 9) AS conf,
      |  round(CAST(supp_ab AS DOUBLE) * (SELECT n FROM n) / (sa.s * sb.s), 9) AS lift
      |FROM pairs JOIN supp sa ON brand_a = sa.b JOIN supp sb ON brand_b = sb.b
      |WHERE supp_ab >= 10
      |ORDER BY brand_a, brand_b""".stripMargin

  // CF1: item-item collaborative filtering — co-occurrence cosine over the
  // customer×part purchase matrix, the classic "customers who bought X also
  // bought Y" recommender primitive (distinct from mb1's basket-grain
  // association rules: customer grain, cosine geometry, bounded profiles).
  // The quadratic pair blowup is bounded STRUCTURALLY: each customer's
  // profile is capped at its 20 most-purchased items via the MERGEABLE
  // TopKByScore aggregate (cnt desc, item asc — the same total order the
  // oracle's ROW_NUMBER declares), so the shuffle carries ≤20 (cnt,item)
  // pairs per customer where a rank window would SORT every (cust,item)
  // row of every group — the window sort was the single largest sf1 cost
  // in the r6 bench (34.9s), and the profile cap is exactly the top-k-per-
  // group shape the aggregate exists for. The pair stage (mb1's chained
  // double explode over the profile array) then emits ≤ C(20,2)=190 pairs
  // per customer regardless of corpus size. Item supports are a
  // dictionary-sized broadcast; the only wide shuffle is the (a,b) pair
  // count. Top-20 by unrounded cosine (identical expression both
  // engines), keys as the tiebreak.
  def cf1(s: SparkSession, dir: String): DataFrame =
    cf1Shape(s, dir, "arrayckpt")

  /** The cf1 pipeline with a named downstream shape — the probe entry
    * (graft.relational.Cf1Probe interleaves the arms in one JVM).
    *
    * "arrayckpt" (ADOPTED, r9): the capped profile is kept in ARRAY form
    * (one row per customer, ≤20 items) and localCheckpoint'ed, so the
    * expensive TopKByScore UDAF aggregation runs exactly ONCE — the r8
    * weak-row mechanism was that agg re-running for each of its three
    * consumers (exchange reuse dedupes only the shuffle below it). The
    * checkpoint is customer-COUNT-sized (≤20 longs per row), an order
    * smaller than r8's exploded-form checkpoint, and the pair stage is
    * mb1's chained double explode (codegen'd Generate, ≤C(20,2) pairs per
    * customer) instead of a self-join — no join build, no second read of
    * the profile exchange. Measured interleaved-A/B (r9 Cf1Probe,
    * local[32], best-of-5/6, both arms sharing the single-exchange ul):
    * sf0.1 1.15 vs 1.16 s (wash — the shared scan+shuffle dominates
    * there), sf1 3.50 vs 4.53 s (the agg re-runs are the decade cost);
    * vs the r8 record (two-exchange ul, lazy self-join) sf1 6.39 → 3.50 s
    * and sf0.1 1.51 → 1.15 s. Identical output rows every round.
    *
    * "selfjoin-lazy" (the r8 shape, kept for the probe): exploded profile,
    * lazy (agg re-runs ×3), co-partitioned self-join pair stage. The
    * r8-measured negatives on OTHER arms (exploded-form checkpoint, HOF
    * flatten/transform pair generation) are in SCALING.md's probe table. */
  private[relational] def cf1Shape(s: SparkSession, dir: String,
      shape: String): DataFrame = {
    import s.implicits._
    // ONE shuffle feeds BOTH aggregation grains: hash partitioning on
    // cust alone satisfies the (cust, item) clustering requirement too
    // (same cust ⇒ same partition ⇒ same (cust, item) co-located), so the
    // explicit repartition replaces two ENSURE_REQUIREMENTS exchanges —
    // (cust, item) for the count, then cust for the top-k — with one.
    // Map-side combine loses nothing here: per-(cust, item) counts are
    // ~1 at every SF (measured 600k → 580k), so the partial agg the
    // groupBy-induced exchange would run compresses nothing.
    val ul = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .repartition($"o_custkey")
      .groupBy($"o_custkey".as("cust"), $"l_partkey".as("item"))
      .agg(count(lit(1)).as("cnt"))
    val topk = udaf(new graft.functions.Aggregators.TopKByScore(20))
    val profArr = ul.groupBy($"cust").agg(topk($"cnt", $"item").as("items"))
    val (supp, pairs) = shape match {
      case "arrayckpt" =>
        val prof = profArr.localCheckpoint()
        val sp = prof.select(explode($"items").as("item"))
          .groupBy($"item").agg(count(lit(1)).as("ni"))
        val pr = prof.select(explode($"items").as("ia"), $"items")
          .select($"ia", explode($"items").as("ib"))
          .filter($"ia" < $"ib")
          .groupBy($"ia", $"ib").agg(count(lit(1)).as("co"))
        (sp, pr)
      case "selfjoin-lazy" =>
        val capped = profArr.select($"cust", explode($"items").as("item"))
        val sp = capped.groupBy($"item").agg(count(lit(1)).as("ni"))
        val pr = capped.toDF("cust", "ia")
          .join(capped.toDF("cust", "ib"), "cust")
          .filter($"ia" < $"ib")
          .groupBy($"ia", $"ib").agg(count(lit(1)).as("co"))
        (sp, pr)
      case other => sys.error(s"unknown cf1 shape: $other")
    }
    pairs.filter($"co" >= 2)
      .join(broadcast(supp.toDF("ia", "na")), "ia")
      .join(broadcast(supp.toDF("ib", "nb")), "ib")
      .withColumn("cosr", $"co".cast("double") /
        (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))))
      .orderBy($"cosr".desc, $"ia", $"ib").limit(20)
      .select($"ia".as("item_a"), $"ib".as("item_b"), $"co", $"na", $"nb",
        round($"cosr", 9).as("cosine"))
  }

  val cf1Sql: String =
    """WITH ul AS (
      |  SELECT o_custkey AS cust, l_partkey AS item, COUNT(*) AS cnt
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2),
      |capped AS (
      |  SELECT cust, item FROM (
      |    SELECT cust, item,
      |      ROW_NUMBER() OVER (PARTITION BY cust ORDER BY cnt DESC, item) AS rk
      |    FROM ul) t WHERE rk <= 20),
      |supp AS (SELECT item, COUNT(*) AS ni FROM capped GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS ia, b.item AS ib, COUNT(*) AS co
      |  FROM capped a JOIN capped b ON a.cust = b.cust AND a.item < b.item
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT ia, ib, co, na.ni AS na, nb.ni AS nb,
      |    CAST(co AS DOUBLE) / (sqrt(CAST(na.ni AS DOUBLE)) * sqrt(CAST(nb.ni AS DOUBLE))) AS cosr
      |  FROM pairs JOIN supp na ON ia = na.item JOIN supp nb ON ib = nb.item
      |  WHERE co >= 2)
      |SELECT ia AS item_a, ib AS item_b, co, na, nb, round(cosr, 9) AS cosine
      |FROM scored ORDER BY cosr DESC, ia, ib LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bfs1_reachability_levels" -> bfs1,
    "cf1_item_similarity" -> cf1,
    "mb1_market_basket" -> mb1,
    "pr1_pagerank" -> pr1,
    "bf1_bloom_semijoin" -> bf1,
    "tc1_triangle_count" -> tc1,
    "kc1_kcore_peel" -> kc1,
    "lp1_label_propagation" -> lp1,
  )

  def oracles: Map[String, String] = Map(
    "bfs1_reachability_levels" -> bfs1Sql,
    "cf1_item_similarity" -> cf1Sql,
    "mb1_market_basket" -> mb1Sql,
    "pr1_pagerank" -> pr1Sql,
    "bf1_bloom_semijoin" -> bf1Sql,
    "tc1_triangle_count" -> tc1Sql,
    "kc1_kcore_peel" -> kc1Sql,
    "lp1_label_propagation" -> lp1Sql,
  )
}
