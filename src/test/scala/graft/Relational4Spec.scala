package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational4, Similarity}

class Relational4Spec extends AnyFunSuite with SparkSpec {

  test("q52 sketch heavy hitters equal the exact count + rank at gate capacity") {
    val got = Relational4.q52HeavyHitters(spark, sf)
      .collect().map(_.toString).toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").desc, col("user_id"))
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id").cast("string").as("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk"), col("user_id"), col("cnt"))
      .orderBy(col("event_type"), col("rnk"))
      .collect().map(_.toString).toSeq
    assert(got == exact && got.nonEmpty)
  }

  test("q53 unpivot emits one row per (year, metric) and round-trips the wide frame") {
    val rows = Relational4.q53Unpivot(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    val wide = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
        count(when(col("o_orderstatus") === "F", 1)).as("completed"),
        count(lit(1)).as("total"))
      .collect()
    assert(rows.size == wide.length * 3)
    wide.foreach { r =>
      val y = r.getInt(0)
      assert(rows((y, "urgent")) == r.getLong(1))
      assert(rows((y, "completed")) == r.getLong(2))
      assert(rows((y, "total")) == r.getLong(3))
    }
  }

  test("q54 FILTER-clause aggregates match the when()-conditional form") {
    val got = Relational4.q54FilterAgg(spark, sf).collect().map(_.toString).toSeq
    val manual = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        (sum(when(year(col("o_orderdate")) >= 1998,
          round(col("o_totalprice") * 100).cast("long"))) / 100.0).as("rev_late"),
        round(sum(when(col("o_orderpriority") === "1-URGENT",
            round(col("o_totalprice") * 100).cast("long"))).cast("double")
          / count(when(col("o_orderpriority") === "1-URGENT", 1)) / 100.0, 2)
          .as("avg_urgent"))
      .orderBy("o_orderstatus").collect().map(_.toString).toSeq
    assert(got == manual)
  }

  test("q55 cogroup reconciliation equals a left-join replay, including no-line orders") {
    val got = Relational4.q55CogroupReconcile(spark, sf)
      .collect().map(_.toString).toSeq
    val l = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")).as("lc"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("tc"))
    val replay = o.join(l, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        when(col("l_orderkey").isNull, "no_lines")
          .when(abs(col("tc") - col("lc")) * 100 <= col("tc"), "within_1pct")
          .otherwise("off").as("status"),
        abs(col("tc") - coalesce(col("lc"), lit(0L))).as("diff"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"), sum(col("diff")).as("sum_diff_cents"))
      .orderBy("status").collect().map(_.toString).toSeq
    assert(got == replay)
    // Orders without line items exist in the corpus and must be reported.
    assert(got.exists(_.contains("no_lines")))
  }

  test("q57 multiset ops match brute bag intersection / difference") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val urgent = orders.filter(_._2 == "1-URGENT").groupBy(_._1).view.mapValues(_.length).toMap
    val done = orders.filter(_._3 == "F").groupBy(_._1).view.mapValues(_.length).toMap
    val keys = (urgent.keySet ++ done.keySet).toSeq.sorted
    val expected = keys.flatMap { k =>
      val common = math.min(urgent.getOrElse(k, 0), done.getOrElse(k, 0))
      val extra = math.max(urgent.getOrElse(k, 0) - done.getOrElse(k, 0), 0)
      if (common > 0 || extra > 0) Some((k, common.toLong, extra.toLong)) else None
    }
    val got = Relational4.q57MultisetOps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // Multiplicities above 1 must occur, else ALL adds nothing over DISTINCT.
    assert(got.exists(x => x._2 > 1 || x._3 > 1))
  }

  test("q58 NOT IN: null-aware anti join, and a planted NULL empties the result") {
    val got = Relational4.q58NotIn(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    // No actual NULLs in the list -> equals the plain anti join.
    val expected = Tables.customer(spark, sf).select(col("c_custkey"))
      .join(
        Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(got == expected && got.nonEmpty)
    // The trap: ONE null in the subquery and NOT IN keeps nothing.
    val withNull = GraftSession.sql(spark, sf,
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL SELECT CAST(NULL AS BIGINT))""".stripMargin)
    assert(withNull.count() == 0)
  }

  test("s08 MIPS top-k matches a brute-force double-precision dot product") {
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    val (qs, cs) = raw.partition(_._1 < 10)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val expected = qs.sortBy(_._1).flatMap { case (qid, q) =>
      cs.map { case (cid, c) => (qid, cid, dot(q, c)) }
        .sortBy { case (_, cid, d) => (-d, cid) }
        .take(5).zipWithIndex
        .map { case ((_, cid, d), i) => (qid, i + 1, cid, math.round(d * 1e4)) }
    }.toSeq
    val got = Similarity.s08Mips(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e4))).toSeq
    assert(got == expected)
  }
}
