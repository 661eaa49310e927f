package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph traversal over the order graph (SURVEY.md §2: q49).
  *
  * The customer—supplier bipartite graph (an edge when a customer's
  * order contains a supplier's line item) is the natural graph hiding
  * in the star schema; k-hop reachability over it is the
  * "blast-radius" primitive — which suppliers/customers are within k
  * relations of a seed — and the same join-per-layer shape PageRank,
  * label propagation, and the dedup CC loop use.
  *
  * Each hop is ONE distributed hash join frontier⋈edges plus an
  * anti-join against the visited set — no driver-side adjacency, no
  * collect; the frontier alternates sides because the graph is
  * bipartite. Edges are distinct'd once and localCheckpoint'ed so the
  * per-hop joins rescan the compacted edge list, not the fact tables;
  * hop count is a fixed constant, so the unrolled plan depth is
  * bounded regardless of data size.
  */
object Graph {

  /** Distinct customer—supplier edges, compacted once. */
  def orderEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .localCheckpoint(true)

  /** q49: BFS layers from customer `seed` to `maxHops` (default 3):
    * depth 1 = the seed's suppliers, depth 2 = customers sharing one of
    * those suppliers, depth 3 = those customers' further suppliers.
    * First-visit depth is minimal because each layer anti-joins the
    * union of all earlier same-side layers.
    */
  def q49KHopReach(
      spark: SparkSession, dir: String,
      seed: Long = 0L, maxHops: Int = 3): DataFrame = {
    val edges = orderEdges(spark, dir)
    val seedDf = Tables.customer(spark, dir)
      .filter(col("c_custkey") === seed)
      .select(col("c_custkey").as("id"))
    var custSeen = seedDf
    var suppSeen = seedDf.filter(lit(false)) // empty, same schema
    var frontier = seedDf // customer side at even depths
    var out = seedDf.select(lit("c").as("node_type"), col("id").as("node_id"),
      lit(0).as("depth"))
    var d = 1
    while (d <= maxHops && !frontier.isEmpty) {
      val custSide = d % 2 == 0 // odd hops land on suppliers
      val next =
        if (!custSide)
          edges.join(frontier, edges("c") === frontier("id"))
            .select(col("s").as("id")).distinct()
            .join(suppSeen.select(col("id").as("seen")),
              col("id") === col("seen"), "left_anti")
        else
          edges.join(frontier, edges("s") === frontier("id"))
            .select(col("c").as("id")).distinct()
            .join(custSeen.select(col("id").as("seen")),
              col("id") === col("seen"), "left_anti")
      // Pin each layer: the next iteration joins against it twice
      // (frontier + seen) and lineage would otherwise double per hop.
      frontier = next.localCheckpoint(true)
      if (custSide) custSeen = custSeen.unionByName(frontier)
      else suppSeen = suppSeen.unionByName(frontier)
      out = out.unionByName(frontier.select(
        lit(if (custSide) "c" else "s").as("node_type"),
        col("id").as("node_id"), lit(d).as("depth")))
      d += 1
    }
    out.orderBy(col("depth"), col("node_type"), col("node_id"))
  }

  /** Unrolled 3-hop oracle — set algebra only (integers and DISTINCT),
    * so the replay is exact.
    */
  val q49OracleSql: String =
    """WITH edges AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |c0 AS (SELECT c_custkey AS id FROM customer WHERE c_custkey = 0),
      |s1 AS (SELECT DISTINCT s AS id FROM edges JOIN c0 ON edges.c = c0.id),
      |c2 AS (SELECT DISTINCT c AS id FROM edges JOIN s1 ON edges.s = s1.id
      |  WHERE c NOT IN (SELECT id FROM c0)),
      |s3 AS (SELECT DISTINCT s AS id FROM edges JOIN c2 ON edges.c = c2.id
      |  WHERE s NOT IN (SELECT id FROM s1))
      |SELECT 'c' AS node_type, id AS node_id, 0 AS depth FROM c0
      |UNION ALL SELECT 's', id, 1 FROM s1
      |UNION ALL SELECT 'c', id, 2 FROM c2
      |UNION ALL SELECT 's', id, 3 FROM s3
      |ORDER BY depth, node_type, node_id""".stripMargin

  val PageRankIters = 3
  val PageRankDamping = 0.85

  /** Fixed-point rank scale: all rank mass lives in integer units of
    * 1e-12, so sums are exact and summation-order-independent — the
    * hash gate can never flip at an ulp boundary the way double
    * accumulation can (the d26 failure class the advisor flagged).
    */
  val PageRankScale = 1000000000000L

  /** q56: PageRank over the undirected bipartite order graph, a fixed
    * `PageRankIters` power iterations — supplier centrality by shared
    * customer mass, the canonical "iterative analytics on a relational
    * engine" workload (q49 walks the graph; this one converges a
    * score over it).
    *
    * Node keys are LONGS — customer c ↦ 2c, supplier s ↦ 2s+1 — so
    * every per-iteration join/agg shuffles fixed-width integers, not
    * varchars (~3× narrower shuffle rows at 100 TB, and the bipartite
    * side bit costs nothing to recover). Arithmetic is FIXED-POINT:
    * ranks are integer multiples of 1/[[PageRankScale]], per-edge
    * contribution is `r div deg` (truncating integer division, exact
    * in both engines), damping is `(85 * inflow) div 100`, teleport is
    * `(15 * scale) div (100 * n)`. Integer sums commute exactly, so
    * the result is bit-identical regardless of partial-agg order —
    * each truncation discards < 1 unit = 1e-12 of mass, far below the
    * ppm presentation grain.
    *
    * Per iteration: ONE join of the checkpointed adjacency against the
    * current rank (both hash-partitioned on the long node key), a
    * partial agg keyed by destination, and a left join back to the
    * node set for the teleport term. Per-iteration state is
    * O(|nodes|); localCheckpoint pins each rank table so plan depth
    * stays constant across iterations. `deg` rides inside the rank
    * table, so the loop never re-joins a separate degree relation.
    */
  def q56PageRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = orderEdges(spark, dir)
    val adj = edges.select(
        (col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      .unionByName(edges.select(
        (col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
    val nodes = adj.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val n = nodes.count()
    val teleport = (15L * PageRankScale) / (100L * n)
    var rank = nodes.select(
      col("node"), col("deg"), lit(PageRankScale / n).as("r"))
    (1 to PageRankIters).foreach { _ =>
      val inflow = adj
        .join(rank, adj("src") === rank("node"))
        .select(col("dst").as("node"), expr("r div deg").as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("inflow"))
      rank = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), col("deg"),
          expr(s"$teleport + (85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100")
            .as("r"))
        .localCheckpoint(true)
    }
    // Presentation in ppm: (r * n) div 1e6 would overflow Long once
    // r (~1e12 scale units, more on hub nodes) meets n ~ 1e7 nodes.
    // Split r = q*1e6 + m: (r*n) div 1e6 == q*n + (m*n) div 1e6
    // exactly for non-negative operands (q*1e6*n is an exact multiple
    // of 1e6), and both terms stay below ~1e13 at 100 TB node counts.
    rank.filter(col("node") % 2 === 1)
      .select(
        expr("(node - 1) div 2").as("s_suppkey"),
        expr(s"(r div 1000000) * $n + ((r % 1000000) * $n) div 1000000")
          .as("pr_ppm"))
      .orderBy(col("s_suppkey"))
  }

  /** Unrolled power-iteration replay: identical integer constants and
    * identical truncating-division algebra (DuckDB `//` and Spark
    * `div` agree on non-negative operands), so the replay is EXACT —
    * no float tolerance anywhere.
    */
  val q56OracleSql: String = {
    def iter(prev: String, out: String): String =
      s"""i$out AS (SELECT a.dst AS node, sum($prev.r // $prev.deg) AS inflow
         |  FROM adj a JOIN $prev ON a.src = $prev.node GROUP BY 1),
         |$out AS (SELECT nodes.node, nodes.deg,
         |    (15 * 1000000000000) // (100 * nn.n)
         |      + (85 * coalesce(i$out.inflow, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN i$out ON nodes.node = i$out.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |adj AS (
       |  SELECT 2 * c AS src, 2 * s + 1 AS dst FROM edges
       |  UNION ALL
       |  SELECT 2 * s + 1, 2 * c FROM edges),
       |nodes AS (SELECT src AS node, count(*) AS deg FROM adj GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, deg, 1000000000000 // nn.n AS r
       |  FROM nodes CROSS JOIN nn),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT CAST((node - 1) // 2 AS BIGINT) AS s_suppkey,
       |  CAST((r * nn.n) // 1000000 AS BIGINT) AS pr_ppm
       |FROM r3 CROSS JOIN nn WHERE node % 2 = 1
       |ORDER BY s_suppkey""".stripMargin
  }

  /** q69: CONNECTED COMPONENTS as a first-class gated query (the
    * primitive the dedup families use internally, exposed directly —
    * GraphFrames' `connectedComponents` shape). The graph is order
    * BURSTS: consecutive orders of the same customer at most 30 days
    * apart are linked, so a component is a maximal run of rapid
    * re-ordering — edges come from ONE window pass partitioned by
    * customer (no self-join), and components never span customers, so
    * they stay small at any corpus size while their COUNT grows with
    * the data. Canonicalization reuses [[Dedup.canonicalizeComponents]]
    * (adaptive driver union-find under the edge cap, bounded-round
    * distributed label propagation + pointer jumping above it). Output
    * is the component-size histogram — O(max burst length) rows.
    */
  /** Nodes (order keys) and burst edges — one window pass, no self-join. */
  private[graft] def burstGraph(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), col("o_custkey").as("c"),
      to_date(col("o_orderdate")).as("d"))
    val w = Window.partitionBy(col("c")).orderBy(col("d"), col("k"))
    val seq = o.select(col("k"), col("c"), col("d"),
      lead(col("k"), 1).over(w).as("nk"), lead(col("d"), 1).over(w).as("nd"))
    val edges = seq
      .filter(col("nk").isNotNull && datediff(col("nd"), col("d")) <= 30)
      .select(col("k").as("a"), col("nk").as("b"))
    (o.select(col("k").as("id")), edges)
  }

  def q69ConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = burstGraph(spark, dir)
    ccSizeHistogram(Dedup.canonicalizeComponents(nodes, edges))
  }

  private[graft] def ccSizeHistogram(labels: DataFrame): DataFrame =
    labels.groupBy(col("canonical_id")).agg(count(lit(1)).as("cc_size"))
      .groupBy(col("cc_size")).agg(count(lit(1)).as("n_components"))
      .orderBy(col("cc_size"))

  /** The DuckDB replay canonicalizes with [[Dedup.ccSql]]'s unrolled
    * star contraction (linear per step, convergence-fenced) — the
    * old recursive walk materialized O(Σ burst²) label pairs, and a
    * min-label ladder propagates one hop per round on the MONOTONE id
    * chains replicated order bursts produce; star steps halve the
    * diameter per LS/SS pair regardless of id order, which is what a
    * 10×+ replay needs (chains reach hundreds of nodes once replicas
    * share custkeys and dates).
    */
  val q69OracleSql: String =
    s"""WITH
      |o AS (SELECT o_orderkey AS k, o_custkey AS c,
      |  CAST(o_orderdate AS DATE) AS d FROM orders),
      |seq AS (SELECT k, c, d,
      |  lead(k) OVER w AS nk, lead(d) OVER w AS nd
      |  FROM o WINDOW w AS (PARTITION BY c ORDER BY d, k)),
      |dups AS (SELECT k AS doc_a, nk AS doc_b FROM seq
      |  WHERE nk IS NOT NULL AND date_diff('day', d, nd) <= 30),
      |docs AS (SELECT k AS doc_id FROM o),
      |${Dedup.ccSql},
      |sizes AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cc_size
      |  FROM canon GROUP BY canonical_id)
      |SELECT cc_size, CAST(count(*) AS BIGINT) AS n_components
      |FROM sizes GROUP BY cc_size ORDER BY cc_size""".stripMargin

  /** q70: TRIANGLE ENUMERATION over the co-purchase graph — parts are
    * linked when they appear together in at least `minSupport` distinct
    * orders (the support filter keeps the projection sparse: a raw
    * co-occurrence projection of a bipartite fact table densifies
    * toward a clique as data grows; frequent co-purchase does not).
    * Triangles = mutually co-purchased triples, the basket-analysis /
    * community-structure primitive (and the local clustering
    * coefficient's numerator).
    *
    * The enumeration is the DEGREE-ORDERED orientation algorithm
    * (Suri–Vassilvitskii's MR triangle counting): orient every edge
    * from its lower-(degree, id) endpoint to the higher, so each
    * out-neighborhood is bounded by O(sqrt(m)) regardless of hubs —
    * a star node of degree d contributes d wedges under id-ordering
    * but ~0 under degree-ordering. Wedges are one self-join of the
    * oriented edge list on the source; each triangle is closed by
    * exactly one oriented edge between the two out-neighbors, so every
    * triangle is emitted exactly once with no post-dedup. All joins
    * are distributed hash joins on node keys; nothing driver-side.
    */
  def q70Triangles(
      spark: SparkSession, dir: String, minSupport: Int = 2): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    // Support-filtered undirected edges, one (x < y) row per pair.
    val edges = li.toDF("ok", "x").join(li.toDF("ok", "y"), "ok")
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select(col("x"), col("y"))
      .localCheckpoint(true)
    trianglesOf(edges)
  }

  /** Degree-ordered triangle enumeration over an undirected edge list
    * (`x`, `y`; one row per pair, either order, no self-loops). Exposed
    * for the spec's synthetic-graph checks.
    */
  private[graft] def trianglesOf(edges: DataFrame): DataFrame = {
    // Total order by (degree, id): k = deg * 2^32 + id never collides
    // while ids fit 32 bits and stays far from Long overflow.
    val deg = edges.select(col("x").as("v"))
      .union(edges.select(col("y").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("dg"))
    val key = (d: Column, id: Column) => d * lit(4294967296L) + id
    val ow = edges
      .join(deg.select(col("v").as("x"), col("dg").as("dx")), "x")
      .join(deg.select(col("v").as("y"), col("dg").as("dy")), "y")
      .select(
        when(key(col("dx"), col("x")) < key(col("dy"), col("y")), col("x"))
          .otherwise(col("y")).as("src"),
        when(key(col("dx"), col("x")) < key(col("dy"), col("y")), col("y"))
          .otherwise(col("x")).as("dst"),
        greatest(key(col("dx"), col("x")), key(col("dy"), col("y"))).as("dk"))
      .localCheckpoint(true)
    val w1 = ow.select(col("src"), col("dst").as("b"), col("dk").as("kb"))
    val w2 = ow.select(col("src"), col("dst").as("c"), col("dk").as("kc"))
    val closing = ow.select(col("src").as("b"), col("dst").as("c"))
    w1.join(w2, "src").filter(col("kb") < col("kc"))
      .join(closing, Seq("b", "c"))
      .select(array_sort(array(col("src"), col("b"), col("c"))).as("t"))
      .select(
        col("t").getItem(0).as("p1"),
        col("t").getItem(1).as("p2"),
        col("t").getItem(2).as("p3"))
      .orderBy(col("p1"), col("p2"), col("p3"))
  }

  /** q73: MARKET-BASKET association metrics — support and LIFT for
    * co-purchased part pairs (the a-priori first rung: which pairs
    * co-occur MORE than independence predicts). Same bounded pair
    * generation as q70 (one order-key self-join, fan-out ≤ lines per
    * order, min-support filter), then per-item order counts join in
    * and lift = n_ab·N / (n_a·n_b) ranks the survivors. All counts
    * are exact integers; the single division happens once per
    * surviving pair in correctly-rounded double, identical in any
    * IEEE engine. Output is the top-`topN` by (lift DESC, pair id) —
    * O(pairs log topN), never a global sort of the pair space at
    * scale (topN is a LIMIT over an ordered shuffle of the
    * support-filtered — already sparse — pair set).
    */
  def q73BasketLift(
      spark: SparkSession, dir: String,
      minSupport: Int = 3, topN: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint(true)
    val nOrders = li.select(col("ok")).distinct().count()
    val item = li.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val pairs = li.toDF("ok", "x").join(li.toDF("ok", "y"), "ok")
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(item.select(col("pk").as("x"), col("n_item").as("n_a")), "x")
      .join(item.select(col("pk").as("y"), col("n_item").as("n_b")), "y")
      .withColumn("lift",
        (col("n_ab") * lit(nOrders)).cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select(col("x").as("p1"), col("y").as("p2"),
        col("n_ab"), col("lift"))
      // Rank on the UNROUNDED lift (matching the oracle's ORDER BY):
      // rounding before the sort could flip the relative order — and
      // the LIMIT membership — of pairs whose true lifts differ only
      // past 4 decimals. Round only in the final projection.
      .orderBy(col("lift").desc, col("p1"), col("p2"))
      .limit(topN)
      .withColumn("lift", round(col("lift"), 4))
  }

  /** Identical integer counts and the identical single double
    * division, ranked and truncated the same way.
    */
  val q73OracleSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM li),
      |item AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
      |pp AS (SELECT a.pk AS x, b.pk AS y, count(*) AS n_ab
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT x AS p1, y AS p2, n_ab,
      |  round(CAST(n_ab * nn.n AS DOUBLE)
      |        / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)), 4) AS lift
      |FROM pp
      |JOIN item ia ON ia.pk = x
      |JOIN item ib ON ib.pk = y
      |CROSS JOIN nn
      |ORDER BY CAST(n_ab * nn.n AS DOUBLE)
      |         / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) DESC,
      |  p1, p2
      |LIMIT 20""".stripMargin

  /** The oracle enumerates the same triangle SET by id-orientation
    * (e1.y = e2.x closing e3) — orientation strategy changes the work
    * distribution, never the result set, and both emit id-sorted
    * triples, so the outputs are row-identical.
    */
  val q70OracleSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |pp AS (SELECT a.pk AS x, b.pk AS y, count(*) AS n
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2),
      |e AS (SELECT x, y FROM pp WHERE n >= 2)
      |SELECT e1.x AS p1, e1.y AS p2, e2.y AS p3
      |FROM e e1
      |JOIN e e2 ON e1.y = e2.x
      |JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
      |ORDER BY 1, 2, 3""".stripMargin
}
