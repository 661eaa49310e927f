package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.plans.ApproxDistinctRule

class SkewAndRulesSpec extends AnyFunSuite with SparkSpec {

  test("q61: AQE skew-join split engages and preserves the join result") {
    val rows = graft.operators.SkewJoin.q61SkewJoinAqe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("skew_split")),
        s"AQE skew split did not engage: $r")
      assert(r.getBoolean(r.fieldIndex("result_match")), r.toString)
    }
  }

  test("q59/q60 approx gates: rewrite fires, error inside bound, conf never leaks") {
    val q59 = graft.operators.ApproxGates.q59ApproxDistinct(spark, sf).collect()
    assert(q59.nonEmpty)
    q59.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")), r.toString)
      assert(r.getBoolean(r.fieldIndex("rewrite_fired")), r.toString)
    }
    val q60 = graft.operators.ApproxGates.q60ApproxPercentile(spark, sf).collect()
    assert(q60.nonEmpty)
    q60.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")), r.toString)
      assert(r.getBoolean(r.fieldIndex("rewrite_fired")), r.toString)
    }
    // The child-session opt-in must not leak into the parent session —
    // other gate queries run concurrently on it with EXACT semantics.
    assert(spark.conf.get(ApproxDistinctRule.ConfKey, "false") == "false")
    assert(spark.conf.get(graft.plans.ApproxPercentileRule.ConfKey, "false") == "false")
  }

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, Seq("o_custkey")).orderBy("o_orderkey")
      .collect().map(_.toString).toSeq
    val salted = SkewJoin.saltedJoin(o, c, Seq("o_custkey"), numSalts = 7)
      .orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("salted left join preserves unmatched left rows") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((1, "x")).toDF("k", "rv")
    val out = SkewJoin.saltedJoin(l, r, Seq("k"), numSalts = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(2)) == 2)
  }

  test("approx-distinct rule rewrites count(distinct) to HLL++ when enabled") {
    val q = Tables.orders(spark, sf).agg(countDistinct(col("o_custkey")).as("n"))
    val exact = q.collect().head.getLong(0)

    spark.conf.set(ApproxDistinctRule.ConfKey, "true")
    try {
      val q2 = Tables.orders(spark, sf).agg(countDistinct(col("o_custkey")).as("n"))
      val plan = q2.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct") || plan.contains("hyperloglog"),
        s"expected HLL++ in plan:\n$plan")
      val approx = q2.collect().head.getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.15)
    } finally spark.conf.set(ApproxDistinctRule.ConfKey, "false")

    // And with the flag off, the exact path is untouched.
    val q3 = Tables.orders(spark, sf).agg(countDistinct(col("o_custkey")).as("n"))
    assert(q3.collect().head.getLong(0) == exact)
  }

  test("approx-percentile rule swaps exact percentile for a GK sketch when enabled") {
    import graft.plans.ApproxPercentileRule
    def q = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      .orderBy("l_returnflag")
    val exact = q.collect().map(_.getDouble(1))

    spark.conf.set(ApproxPercentileRule.ConfKey, "true")
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx") || plan.contains("approx_percentile"),
        s"expected approx percentile in plan:\n$plan")
      val approx = q.collect().map(_.getDouble(1))
      exact.zip(approx).foreach { case (e, a) =>
        assert(math.abs(e - a) <= math.max(1.0, e * 0.05), s"$e vs $a")
      }
    } finally spark.conf.set(ApproxPercentileRule.ConfKey, "false")

    // Flag off: exact path untouched.
    assert(q.collect().map(_.getDouble(1)).toSeq == exact.toSeq)
  }

  test("approx-percentile rewrite keeps DoubleType for integral inputs") {
    import graft.plans.ApproxPercentileRule
    // Percentile is always double; ApproximatePercentile returns the
    // child type — the rule must cast so a resolved plan's types never
    // shift (median of an int column stays fractional).
    def q = Tables.lineitem(spark, sf)
      .agg(expr("percentile(l_linenumber, 0.5)").as("med"))
    spark.conf.set(ApproxPercentileRule.ConfKey, "true")
    try {
      val row = q.collect().head
      assert(q.schema("med").dataType == org.apache.spark.sql.types.DoubleType)
      val v = row.getDouble(0)
      assert(v >= 1.0 && v <= 7.0)
    } finally spark.conf.set(ApproxPercentileRule.ConfKey, "false")
  }

  test("s03 IVF ANN: full ranked output, recall vs brute force") {
    val brute = graft.operators.Similarity.s01AnnBrute(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf = graft.operators.Similarity.s03AnnIvf(spark, sf).collect()
    assert(ivf.nonEmpty)
    val pairs = ivf.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (brute & pairs).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f")
    assert(recall > 0.3) // nProbe=4 of 16 clusters should catch most
  }
}
