package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite with SparkSpec {

  test("q49 3-hop reachability matches a driver-side BFS replay") {
    val edges = Graph.orderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupplier = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val byCustomer = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val c0 = Set(0L)
    val s1 = c0.flatMap(byCustomer.getOrElse(_, Set.empty[Long]))
    val c2 = s1.flatMap(bySupplier.getOrElse(_, Set.empty[Long])) -- c0
    val s3 = c2.flatMap(byCustomer.getOrElse(_, Set.empty[Long])) -- s1
    val expect = Map(("c", 0) -> c0, ("s", 1) -> s1, ("c", 2) -> c2, ("s", 3) -> s3)

    val got = Graph.q49KHopReach(spark, sf).collect()
      .groupBy(r => (r.getString(0), r.getInt(2)))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got == expect.filter(_._2.nonEmpty))
    // Depth is the MINIMAL hop count: no node appears at two depths.
    val all = got.toSeq.flatMap { case ((t, _), ids) => ids.map((t, _)) }
    assert(all.distinct.length == all.length)
  }

  test("q49 stops early when the seed has no edges") {
    // Seed -1 matches no customer: only the (empty) BFS result.
    val out = Graph.q49KHopReach(spark, sf, seed = -1L)
    assert(out.collect().isEmpty)
  }

  test("q56 pagerank matches a driver-side fixed-point power iteration EXACTLY") {
    val edges = Graph.orderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Same integer encoding (c ↦ 2c, s ↦ 2s+1) and the same truncating
    // fixed-point algebra as the distributed side — integer arithmetic
    // commutes, so the comparison is equality, not tolerance.
    val adj: Seq[(Long, Long)] = edges.toSeq.flatMap { case (c, s) =>
      Seq((2 * c, 2 * s + 1), (2 * s + 1, 2 * c))
    }
    val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = adj.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val scale = Graph.PageRankScale
    val tele = (15L * scale) / (100L * n)
    var r = nodes.map(_ -> scale / n).toMap
    (1 to Graph.PageRankIters).foreach { _ =>
      val inflow = adj.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = nodes.map(v =>
        v -> (tele + (85L * inflow.getOrElse(v, 0L)) / 100L)).toMap
    }
    val expected = nodes.filter(_ % 2 == 1)
      .map(v => ((v - 1) / 2, (r(v) * n) / 1000000L)).sortBy(_._1)
    val got = Graph.q56PageRank(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    assert(got == expected)
    // The fixed-point result still IS PageRank: each truncation loses
    // < 1e-12 of mass, so scaled ranks stay near the double answer.
    // Suppliers are the rarer side of the bipartite graph, so their
    // mean scaled rank sits above the all-node mean of 1e6 ppm.
    val meanPpm = got.map(_._2).sum.toDouble / got.length
    assert(meanPpm > 1e5 && meanPpm < 1e9, s"mean ppm $meanPpm")
  }

  test("q69 connected components: mass conserved, and the distributed CC path agrees") {
    import graft.operators.Dedup
    val hist = Graph.q69ConnectedComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = Tables.orders(spark, sf).count()
    assert(hist.map { case (sz, n) => sz * n }.sum == nOrders,
      "every order must land in exactly one component")
    assert(hist.exists(_._1 > 1), "30-day bursts must link some orders")
    // The adaptive driver union-find and the distributed label
    // propagation + pointer jumping must canonicalize identically.
    val (nodes, edges) = Graph.burstGraph(spark, sf)
    val distributed = Graph.ccSizeHistogram(
      Dedup.canonicalizeComponents(nodes, edges, driverEdgeLimit = 0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(distributed.toSeq == hist.toSeq,
      "distributed CC must equal the driver union-find fast path")
  }

  test("q70 triangles equal a brute triple scan of the co-purchase graph") {
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = pairs.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size)
    val edges = support.collect { case ((x, y), n) if n >= 2 => (x, y) }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = (for {
      (x, y) <- edges.toSeq
      z <- (adj(x) intersect adj(y)) if z > y
    } yield (x, y, z)).filter { case (x, y, _) => x < y }.sorted
    val got = Graph.q70Triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute.sorted)
    assert(got == got.sorted, "output is ordered by the sorted triple")
  }

  test("q73 basket lift equals a brute support/lift replay, ranked and truncated") {
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = pairs.map(_._1).distinct.length.toLong
    val nItem = pairs.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length.toLong)
    val pairCounts = pairs.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
    val want = pairCounts.toSeq.collect {
      case ((x, y), nab) if nab >= 3 =>
        val lift = (nab * nOrders).toDouble / (nItem(x).toDouble * nItem(y).toDouble)
        (x, y, nab, lift)
    }.sortBy { case (x, y, _, lift) => (-lift, x, y) }.take(20)
      .map { case (x, y, nab, lift) =>
        (x, y, nab, math.round(lift * 10000) / 10000.0)
      }
    val got = graft.operators.Graph.q73BasketLift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // Lift > 1 means over-independence co-occurrence — the metric is
    // doing its job if the top of the ranking clears 1.
    assert(got.head._4 > 1.0)
  }

  test("trianglesOf: degree orientation emits each triangle exactly once, hubs included") {
    import spark.implicits._
    // A hub (0) fanning to 1..40, a K4 on {1,2,3,4}, and the hub closing
    // a triangle with (1,2): triangles = C(4,3) inside the K4 plus
    // (0,1,2) through the hub... every hub pair is an edge to check the
    // orientation never double-counts or misses through high degree.
    val k4 = for (i <- 1 to 4; j <- i + 1 to 4) yield (i.toLong, j.toLong)
    val star = (1 to 40).map(i => (0L, i.toLong))
    val edges = (k4 ++ star).toDF("x", "y")
    val got = Graph.trianglesOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (for (i <- 1 to 4; j <- i + 1 to 4; k <- j + 1 to 4)
      yield (i.toLong, j.toLong, k.toLong)) ++
      (for (i <- 1 to 4; j <- i + 1 to 4) yield (0L, i.toLong, j.toLong))
    assert(got.sorted == want.sorted)
  }
}
