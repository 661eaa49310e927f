package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** q56: PageRank over the undirected bipartite order graph, a fixed
    * `PageRankIters` power iterations — supplier centrality by shared
    * customer mass, the canonical "iterative analytics on a relational
    * engine" workload (q49 walks the graph; this one converges a
    * score over it).
    *
    * Per iteration: ONE join of the checkpointed adjacency against the
    * current rank (both hash-partitioned on the node key), contribution
    * sum as a partial agg keyed by destination, and a left join back to
    * the node set for the teleport term. Per-iteration state is
    * O(|nodes|); localCheckpoint pins each rank table so plan depth
    * stays constant across iterations. Constants are written as the
    * SAME literals the oracle uses (0.15, 0.85) — deriving them
    * (1 - damping) lands on a different double and the drift, however
    * tiny, is the kind of thing a hash gate exists to catch.
    */
  def q56PageRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = orderEdges(spark, dir)
    val adj = edges.select(
        concat(lit("c"), col("c")).as("src"), concat(lit("s"), col("s")).as("dst"))
      .unionByName(edges.select(
        concat(lit("s"), col("s")).as("src"), concat(lit("c"), col("c")).as("dst")))
    // The out-degree-normalized TRANSITION matrix, built once: per
    // iteration the plan is then a single transition⋈rank join + one
    // partial agg — joining `deg` inside the loop would re-pay that
    // join every iteration. The node set is deg's key set (every node
    // has deg >= 1 by construction), so no separate distinct pass.
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val trans = adj.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint(true)
    val nodes = deg.select(col("src").as("node"))
    val n = nodes.count()
    var rank = nodes.withColumn("r", lit(1.0 / n))
    (1 to PageRankIters).foreach { _ =>
      val inflow = trans
        .join(rank, trans("src") === rank("node"))
        .select(col("dst").as("node"), (col("w") * col("r")).as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("inflow"))
      rank = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) / n + lit(PageRankDamping) * coalesce(col("inflow"), lit(0.0)))
            .as("r"))
        .localCheckpoint(true)
    }
    rank.filter(col("node").startsWith("s"))
      .select(
        expr("CAST(substr(node, 2) AS BIGINT)").as("s_suppkey"),
        round(col("r") * n, 6).as("pr_scaled"))
      .orderBy(col("s_suppkey"))
  }

  /** Unrolled power-iteration replay: identical constants, identical
    * join/agg algebra, scaled-rank presentation.
    */
  val q56OracleSql: String = {
    // e0 suffixes force DOUBLE literals — DuckDB parses bare 0.15 as
    // DECIMAL and decimal division would diverge from Spark's doubles.
    // The replay pre-normalizes weights (w = 1/deg) and sums w*r,
    // matching the Spark side's transition-matrix arithmetic exactly.
    def iter(prev: String, out: String): String =
      s"""i$out AS (SELECT t.dst AS node, sum(t.w * $prev.r) AS inflow
         |  FROM trans t JOIN $prev ON t.src = $prev.node GROUP BY 1),
         |$out AS (SELECT nodes.node,
         |    0.15e0 / nn.n + 0.85e0 * coalesce(i$out.inflow, 0.0e0) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN i$out ON nodes.node = i$out.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |adj AS (
       |  SELECT 'c' || CAST(c AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst
       |  FROM edges
       |  UNION ALL
       |  SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM edges),
       |deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY 1),
       |trans AS (SELECT a.src, a.dst, 1.0e0 / deg.deg AS w
       |  FROM adj a JOIN deg ON a.src = deg.src),
       |nodes AS (SELECT src AS node FROM deg),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0e0 / nn.n AS r FROM nodes CROSS JOIN nn),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT CAST(substr(node, 2) AS BIGINT) AS s_suppkey,
       |  round(r * nn.n, 6) AS pr_scaled
       |FROM r3 CROSS JOIN nn WHERE node LIKE 's%'
       |ORDER BY s_suppkey""".stripMargin
  }
}
