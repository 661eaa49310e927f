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
}
