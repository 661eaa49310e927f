package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {

  test("raw SQL over registered views matches the DataFrame API result") {
    val viaSql = GraftSession.sql(spark, sf,
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-07-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toString).toSeq

    val viaDf = Relational.q01AggPricing(spark, sf)
      .selectExpr("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(_.toString).toSeq

    assert(viaSql == viaDf)
  }

  test("graft extension functions are callable from registered-view SQL") {
    val r = GraftSession.sql(spark, sf,
      """SELECT e1.vec_id AS a, e2.vec_id AS b,
        |  graft_cosine_sim(e1.embedding, e2.embedding) AS cos
        |FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id = e2.vec_id
        |WHERE e1.vec_id < 3
        |ORDER BY a""".stripMargin).collect()
    assert(r.length == 3)
    r.foreach(row => assert(math.abs(row.getAs[Double]("cos") - 1.0) < 1e-6))
  }

  test("custom aggregates are callable from SQL (topk, quantile sketch)") {
    val topk = GraftSession.sql(spark, sf,
      """SELECT graft_topk_by_score(CAST(c_acctbal AS DOUBLE), c_custkey, 3) AS tk
        |FROM customer""".stripMargin).collect()
    val tk = topk.head.getSeq[org.apache.spark.sql.Row](0)
    assert(tk.length == 3)
    assert(tk.map(_.getAs[Double]("score")).sliding(2).forall(p => p.head >= p.last))

    val qs = GraftSession.sql(spark, sf,
      """SELECT c_nationkey,
        |  graft_quantile_sketch(CAST(c_acctbal AS DOUBLE), array(0.5D, 0.9D)) AS q
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin).collect()
    assert(qs.length == 25)
    qs.foreach { r =>
      val arr = r.getSeq[Double](1)
      assert(arr.length == 2 && arr(0) <= arr(1))
    }
    // decimal-literal percentages coerce too
    val dec = GraftSession.sql(spark, sf,
      "SELECT graft_quantile_sketch(CAST(c_acctbal AS DOUBLE), array(0.5)) AS q FROM customer")
      .collect()
    assert(dec.head.getSeq[Double](0).length == 1)

    // Heavy hitters from SQL, exact regime: matches a plain count+rank.
    val hh = GraftSession.sql(spark, sf,
      """SELECT graft_heavy_hitters(o_orderpriority, 2, 64) AS hh
        |FROM orders""".stripMargin).collect()
    val items = hh.head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("cnt")))
    val exact = GraftSession.sql(spark, sf,
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |GROUP BY 1 ORDER BY cnt DESC, o_orderpriority LIMIT 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(items == exact)

    // Bloom build from SQL equals the Column-API bytes, and membership
    // answers correctly for present keys.
    val sqlBloom = GraftSession.sql(spark, sf,
      "SELECT graft_bloom_agg(o_orderkey, 1024) AS b FROM orders")
      .collect().head.getAs[Array[Byte]](0)
    val apiBloom = Tables.orders(spark, sf)
      .agg(graft.functions.VectorFunctions.bloomAgg(
        org.apache.spark.sql.functions.col("o_orderkey"), 1024).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sqlBloom, apiBloom))
    val words = graft.plans.GraftBloom.fromBytes(sqlBloom)
    assert(graft.plans.GraftBloom.mightContain(
      words, graft.plans.GraftBloom.DefaultK, 0L))
  }
}
