package graft

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

  test("q56 pagerank matches a driver-side power iteration") {
    val edges = Graph.orderEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj: Seq[(String, String)] = edges.toSeq.flatMap { case (c, s) =>
      Seq((s"c$c", s"s$s"), (s"s$s", s"c$c"))
    }
    val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = adj.map(_._1).distinct.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to Graph.PageRankIters).foreach { _ =>
      val inflow = adj.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = nodes.map(v =>
        v -> (0.15 / n + Graph.PageRankDamping * inflow.getOrElse(v, 0.0))).toMap
    }
    val expected = nodes.filter(_.startsWith("s"))
      .map(v => (v.drop(1).toLong, r(v) * n)).sortBy(_._1)
    val got = Graph.q56PageRank(spark, sf).collect()
      .map(row => (row.getLong(0), row.getDouble(1))).toSeq
    assert(got.map(_._1) == expected.map(_._1))
    got.zip(expected).foreach { case ((id, g), (_, e)) =>
      assert(math.abs(g - e) < 2e-6, s"supplier $id: $g vs $e")
    }
    // Probability mass is conserved: scaled ranks average to 1.
    val totalScaled = got.map(_._2).sum / got.length
    assert(totalScaled > 0.1) // suppliers hold nonzero mass
  }
}
