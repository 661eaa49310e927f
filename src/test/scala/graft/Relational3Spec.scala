package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational3

class Relational3Spec extends AnyFunSuite with SparkSpec {

  test("q43 EXISTS/NOT EXISTS plans as semi+anti and excludes F-status customers") {
    val df = Relational3.q43ExistsSubquery(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Semi") && plan.contains("Anti"),
      s"expected semi+anti join rewrite, got:\n$plan")
    val keys = df.collect().map(_.getAs[Long]("c_custkey")).toSet
    // Manual cross-check: any selected customer must have no F order.
    import org.apache.spark.sql.functions._
    val fCusts = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(keys.intersect(fCusts).isEmpty)
  }

  test("q44 merge actions partition the key space correctly") {
    import org.apache.spark.sql.functions._
    val rows = Relational3.q44MergeUpsert(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("o_custkey")).distinct.length == rows.length,
      "one merged row per customer key")
    val o = Tables.orders(spark, sf)
    val baseKeys = o.filter(year(col("o_orderdate")) === 1997)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val updKeys = o.filter(year(col("o_orderdate")) >= 1998)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val k = r.getAs[Long]("o_custkey")
      val expected =
        if (baseKeys(k) && updKeys(k)) "updated"
        else if (updKeys(k)) "inserted"
        else "kept"
      assert(r.getAs[String]("merge_action") == expected, s"key $k")
    }
  }

  test("q45 SCD2 versions are contiguous and ranges chain per customer") {
    val rows = Relational3.q45Scd2(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, hist) =>
      val sorted = hist.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to sorted.length))
      // valid_to of version v == valid_from of version v+1; open tail NULL.
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(a.fieldIndex("valid_to")) == b.get(b.fieldIndex("valid_from")))
        case _ => ()
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")))
      // Consecutive versions must actually change priority.
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("prio") != b.getAs[String]("prio"))
        case _ => ()
      }
    }
  }

  test("q46 prev_f_price skips non-F gaps (matches per-customer replay)") {
    import org.apache.spark.sql.functions._
    val got = Relational3.q46IgnoreNulls(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")) ->
        Option(r.getAs[java.lang.Double]("prev_f_price")).map(_.toDouble))
      .toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d_us"),
        col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("d_us"),
        r.getAs[String]("o_orderstatus"), r.getAs[Double]("o_totalprice")))
    orders.groupBy(_._1).foreach { case (ck, os) =>
      val sorted = os.sortBy(o => (o._3, o._2))
      var lastF: Option[Double] = None
      sorted.foreach { case (_, ok, _, status, price) =>
        val expected = lastF.map(p => math.round(p * 100.0) / 100.0)
        assert(got((ck, ok)) == expected, s"cust $ck order $ok")
        if (status == "F") lastF = Some(price)
      }
    }
  }

  test("q47 recursive month spine is contiguous and conserves order counts") {
    val rows = Relational3.q47RecursiveCte(spark, sf).collect()
    val months = rows.map(_.getAs[String]("month"))
    assert(months.head.endsWith("-01") && months.toSeq == months.sorted.toSeq)
    // Contiguous: every consecutive pair is exactly one month apart.
    months.sliding(2).foreach {
      case Array(a, b) =>
        val (ya, ma) = (a.substring(0, 4).toInt, a.substring(5, 7).toInt)
        val (yb, mb) = (b.substring(0, 4).toInt, b.substring(5, 7).toInt)
        assert(yb * 12 + mb == ya * 12 + ma + 1, s"$a -> $b")
      case _ => ()
    }
    // Spine conserves the fact table: per-month counts sum to |orders|.
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf).count())
  }

  test("q48 lateral top-2 equals a window top-2 and decorrelates (no per-row subquery)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = Relational3.q48LateralTopN(spark, sf)
    val got = df.collect().map(_.toString).toSeq
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy("c_custkey", "rn")
      .collect().map(_.toString).toSeq
    assert(got == expect)
  }

  test("src06 ORC round-trip preserves the aggregate") {
    val q = SparkEntry.queries("src06_orc_roundtrip")
    val rows = q(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy("o_orderstatus").collect()
    assert(rows.toSeq == direct.toSeq)
  }

  test("q50 sliding distinct count matches a brute per-day set union") {
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byType = evs.groupBy(_._1)
    val expected = byType.toSeq.sortBy(_._1).flatMap { case (et, xs) =>
      val days = xs.map(_._2).distinct.sorted((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
      days.map { d =>
        val users = xs.filter(x =>
          !x._2.isAfter(d) && !x._2.isBefore(d.minusDays(6))).map(_._3).toSet
        (et, d.toString, users.size.toLong)
      }
    }
    val got = Relational3.q50WindowDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toString, r.getLong(2))).toSeq
    assert(got == expected)
    // Sliding unions must exceed single-day distincts somewhere, or the
    // window isn't doing anything.
    val daily = evs.groupBy(x => (x._1, x._2)).map { case (k, xs) => k -> xs.map(_._3).toSet.size }
    assert(got.exists { case (et, d, u7) =>
      u7 > daily((et, java.time.LocalDate.parse(d))) })
  }
}
