package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkSpec {

  test("q01 aggregates by returnflag x linestatus with positive sums") {
    val rows = Relational.q01AggPricing(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q03 top-N is sorted descending by totalprice") {
    val prices = Relational.q03TopN(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 20)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q04 star join covers all regions present") {
    val rows = Relational.q04JoinStar(spark, sf).collect()
    assert(rows.map(_.getAs[String]("r_name")).distinct.length == 5)
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("q08 cumulative is monotonically nondecreasing") {
    val cum = Relational.q08Cumulative(spark, sf).collect().map(_.getAs[Long]("cum_cents"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
  }

  test("q11 rollup has exactly one grand-total row equal to table size") {
    val rows = Relational.q11Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = Tables.customer(spark, sf).count()
    assert(grand.head.getAs[Long]("n_cust") == total)
  }

  test("q20 session counts are bounded by event counts") {
    Relational.q20Sessionize(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n_events")
      val s = r.getAs[Long]("n_sessions")
      assert(s >= 1 && s <= n)
    }
  }

  test("q41 gap-fill carries the last observation forward over calendar gaps") {
    val rows = graft.operators.Relational2.q41GapFill(spark, sf).collect()
    // Spine completeness: every status covers the same full day range.
    val byStatus = rows.groupBy(_.getString(0))
    val nDays = byStatus.values.map(_.length).toSet
    assert(nDays.size == 1, s"statuses cover different day counts: $nDays")
    byStatus.values.foreach { rs =>
      var lastSeen: Option[Long] = None
      rs.sortBy(_.getDate(1).toString).foreach { r =>
        val obs = if (r.isNullAt(2)) None else Some(r.getLong(2))
        val filled = if (r.isNullAt(3)) None else Some(r.getLong(3))
        if (obs.isDefined) lastSeen = obs
        assert(filled == lastSeen, s"LOCF violated at $r")
      }
    }
    // The fill actually did something: some gap day inherits a value.
    assert(rows.exists(r => r.isNullAt(2) && !r.isNullAt(3)))
  }

  test("q42 full outer keeps every nation present on either side") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational2.q42FullOuter(spark, sf).collect()
    val cKeys = Tables.customer(spark, sf).select("c_nationkey").distinct()
      .collect().map(_.getInt(0)).toSet
    val sKeys = Tables.supplier(spark, sf).select("s_nationkey").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(rows.map(_.getInt(0)).toSet == (cKeys ++ sKeys))
    rows.foreach { r =>
      val nk = r.getInt(0)
      assert((r.getLong(1) > 0) == cKeys(nk))
      assert((r.getLong(2) > 0) == sKeys(nk))
    }
  }

  test("q40 grouping sets equals the union of the three explicit groupings") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
    def g(cols: Seq[String]): Seq[(Option[String], Option[String], Long)] = {
      val grouped =
        if (cols.isEmpty) o.agg(count(lit(1)).as("n"))
        else o.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      grouped.collect().map { r =>
        val m = cols.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap
        (m.get("o_orderstatus"), m.get("o_orderpriority"), r.getAs[Long]("n"))
      }.toSeq
    }
    val expected = (g(Seq("o_orderstatus")) ++ g(Seq("o_orderpriority")) ++ g(Nil))
      .sortBy(t => (t._1.getOrElse(""), t._2.getOrElse(""), t._3))
    val got = graft.operators.Relational2.q40GroupingSets(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getAs[Long]("n")))
      .sortBy(t => (t._1.getOrElse(""), t._2.getOrElse(""), t._3)).toSeq
    assert(got == expected)
    // grouping() markers disambiguate subtotal rows from NULL values
    graft.operators.Relational2.q40GroupingSets(spark, sf).collect().foreach { r =>
      assert((r.getInt(4) == 1) == r.isNullAt(0))
      assert((r.getInt(5) == 1) == r.isNullAt(1))
    }
  }

  test("hot paths run inside WholeStageCodegen (no interpreted hot loops)") {
    // The scan→filter→partial-agg pipelines must fuse: codegen'd spans
    // are the difference between compiled loops and per-row virtual
    // calls at 100 TB. (Streaming/stateful and sketch-aggregate plans
    // legitimately fall back to imperative operators.)
    for (q <- Seq(
        graft.operators.Relational.q01AggPricing(spark, sf),
        graft.operators.Relational.q02FilterProject(spark, sf),
        graft.operators.Relational.q04JoinStar(spark, sf),
        graft.operators.Analytics.q64Histogram(spark, sf))) {
      q.collect() // AQE only materializes codegen spans in the FINAL plan
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
        s"no codegen span in:\n${plan.take(600)}")
    }
    // The native CosineSim expression stays codegen-compatible inside
    // a fused projection (its doGenCode path, not eval()).
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(100)
    val cos = emb.select(
      graft.functions.VectorFunctions.cosineSimNative(
        col("embedding"), col("embedding")).as("c"))
    val cosPlan = cos.queryExecution.executedPlan.toString
    assert(cosPlan.contains("WholeStageCodegen") || cosPlan.contains("*("))
    cos.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-6))
  }
}
