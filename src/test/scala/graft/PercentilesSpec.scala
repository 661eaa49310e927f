package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentiles

class PercentilesSpec extends AnyFunSuite with SparkSpec {

  test("rank-based exact percentiles equal the built-in percentile aggregate") {
    val li = Tables.lineitem(spark, sf)
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("mq"),
        expr("percentile(l_quantity, 0.9)").as("pq"),
        expr("percentile(l_extendedprice, 0.5)").as("mp"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 1e4), math.round(r.getDouble(2) * 1e4),
        math.round(r.getDouble(3) * 1e4)))

    val qty = Percentiles.exactByRank(
      li, "l_returnflag", "l_quantity", Seq(0.5, 0.9), Seq("mq", "pq"))
    val price = Percentiles.exactByRank(
      li, "l_returnflag", "l_extendedprice", Seq(0.5), Seq("mp"))
    val ranked = qty.join(price, "l_returnflag").orderBy("l_returnflag")
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 1e4), math.round(r.getDouble(2) * 1e4),
        math.round(r.getDouble(3) * 1e4)))

    assert(ranked.toSeq == builtin.toSeq)
  }

  test("histogram-based exact percentiles equal the built-in percentile aggregate") {
    val li = Tables.lineitem(spark, sf)
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("mq"),
        expr("percentile(l_quantity, 0.9)").as("pq"),
        expr("percentile(l_extendedprice, 0.5)").as("mp"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 1e4), math.round(r.getDouble(2) * 1e4),
        math.round(r.getDouble(3) * 1e4)))

    val qty = Percentiles.exactByHistogram(
      li, "l_returnflag", "l_quantity", Seq(0.5, 0.9), Seq("mq", "pq"))
    val price = Percentiles.exactByHistogram(
      li, "l_returnflag", "l_extendedprice", Seq(0.5), Seq("mp"))
    val got = qty.join(price, "l_returnflag").orderBy("l_returnflag")
      .collect().map(r => (r.getString(0),
        math.round(r.getDouble(1) * 1e4), math.round(r.getDouble(2) * 1e4),
        math.round(r.getDouble(3) * 1e4)))
    assert(got.toSeq == builtin.toSeq)
  }

  test("histogram narrowing survives tiny collect budgets and duplicate floods") {
    import spark.implicits._
    // Forces multi-round narrowing (budget 16 rows) over a group of
    // 500 values, plus a duplicate flood where the median bucket can
    // never split (all-equal guard must resolve it).
    val varied = (1 to 500).map(i => ("a", i * 1.0))
    val flood = Seq.fill(400)(("b", 7.0)) ++ Seq(("b", 1.0), ("b", 99.0))
    val df = (varied ++ flood).toDF("g", "v")
    val out = Percentiles.exactByHistogram(
      df, "g", "v", Seq(0.5), Seq("p50"), nBuckets = 8, maxCollect = 16)
      .orderBy("g").collect()
    // a: median of 1..500 = 250.5; b: 402 values, 400 of them 7.0
    assert(math.abs(out(0).getDouble(1) - 250.5) < 1e-9)
    assert(out(1).getDouble(1) == 7.0)
  }

  test("histogram percentiles match the builtin on randomized distributions") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    (1 to 3).foreach { trial =>
      // Mixed shapes per group: uniform, heavy-duplicate, exponential
      // tail, including negative values and a tiny group.
      val data =
        Seq.fill(400)(("u", rnd.nextDouble() * 200 - 100)) ++
        Seq.fill(300)(("dup", (rnd.nextInt(5) * 10).toDouble)) ++
        Seq.fill(500)(("exp", -math.log(rnd.nextDouble()) * 50)) ++
        Seq.fill(3)(("tiny", rnd.nextDouble()))
      val df = data.toDF("g", "v").repartition(7)
      val ps = Seq(0.01, 0.25, 0.5, 0.9, 0.99)
      val names = ps.indices.map(i => s"p$i")
      val expected = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getSeq[Double](1).map(x => math.round(x * 1e9)).toSeq))
      val got = Percentiles.exactByHistogram(df, "g", "v", ps, names,
        nBuckets = 32, maxCollect = 64)
        .orderBy("g").collect()
        .map(r => (r.getString(0),
          names.indices.map(i => math.round(r.getDouble(i + 1) * 1e9)).toSeq))
      assert(got.toSeq == expected.toSeq, s"trial $trial")
    }
  }

  test("numeric group keys and single-row groups interpolate correctly") {
    import spark.implicits._
    val df = Seq(
      (1, 10.0), (1, 20.0), (1, 30.0), (1, 40.0), // p50 = 25, p90 = 37
      (2, 7.5) // single row: every percentile is the value itself
    ).toDF("g", "v")
    val out = Percentiles.exactByRank(df, "g", "v", Seq(0.5, 0.9), Seq("p50", "p90"))
      .orderBy("g").collect()
    assert(out(0).getInt(0) == 1)
    assert(math.abs(out(0).getDouble(1) - 25.0) < 1e-9)
    assert(math.abs(out(0).getDouble(2) - 37.0) < 1e-9)
    assert(out(1).getInt(0) == 2)
    assert(out(1).getDouble(1) == 7.5 && out(1).getDouble(2) == 7.5)
  }

  test("null group keys resolve in both forms") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), 1.0), (Option("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0),
      (Option.empty[String], 30.0)
    ).toDF("g", "v")
    // maxCollect = 2 forces the histogram path for both groups, so the
    // null key flows through the cluster join (null-safe <=>), not just
    // the small-collect path.
    val hist = Percentiles.exactByHistogram(
      df, "g", "v", Seq(0.5), Seq("p50"), nBuckets = 4, maxCollect = 2)
      .orderBy("g").collect()
    assert(hist.length == 2)
    assert(hist(0).isNullAt(0) && math.abs(hist(0).getDouble(1) - 20.0) < 1e-9)
    assert(hist(1).getString(0) == "a" && math.abs(hist(1).getDouble(1) - 2.0) < 1e-9)

    val ranked = Percentiles.exactByRank(df, "g", "v", Seq(0.5), Seq("p50"))
      .orderBy("g").collect()
    assert(ranked.length == 2)
    assert(ranked(0).isNullAt(0) && math.abs(ranked(0).getDouble(1) - 20.0) < 1e-9)
    assert(ranked(1).getString(0) == "a" && math.abs(ranked(1).getDouble(1) - 2.0) < 1e-9)
  }

  test("fused multi-column ladder equals independent single-column ladders") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    // Two value columns with DIFFERENT null patterns, tiny budgets so
    // both lanes' clusters share several narrowing rounds.
    val data = (1 to 600).map { i =>
      val g = Seq("x", "y", "z")(rnd.nextInt(3))
      val a = if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 100)
      val b = if (rnd.nextInt(7) == 0) None else Some((rnd.nextInt(6) * 5).toDouble)
      (g, a, b)
    }
    val df = data.toDF("g", "a", "b").repartition(5)
    val fused = Percentiles.exactByHistogramMulti(df, "g", Seq(
      Percentiles.HistSpec("a", Seq(0.25, 0.5), Seq("a25", "a50")),
      Percentiles.HistSpec("b", Seq(0.5, 0.9), Seq("b50", "b90"), discrete = true)),
      nBuckets = 16, maxCollect = 48)
      .orderBy("g").collect()
      .map(r => (r.getString(0), (1 to 4).map(r.getDouble).toSeq))
    val lane0 = Percentiles.exactByHistogram(
      df, "g", "a", Seq(0.25, 0.5), Seq("a25", "a50"),
      nBuckets = 16, maxCollect = 48)
    val lane1 = Percentiles.exactByHistogram(
      df, "g", "b", Seq(0.5, 0.9), Seq("b50", "b90"),
      nBuckets = 16, maxCollect = 48, discrete = true)
    val joined = lane0.join(lane1, "g").orderBy("g").collect()
      .map(r => (r.getString(0), (1 to 4).map(r.getDouble).toSeq))
    assert(fused.toSeq == joined.toSeq)
  }

  test("medianMadDiscrete matches brute-force median, MAD and fence counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(9090)
    val data = (1 to 500).map { i =>
      val g = Seq("p", "q")(rnd.nextInt(2))
      (g, (rnd.nextInt(200) - 100).toDouble)
    } ++ Seq.fill(300)(("dup", 42.0)) ++ Seq(("dup", 1.0), ("dup", 400.0))
    val df = data.toDF("g", "v").repartition(4)
    def discMedian(vs: Seq[Double]): Double = {
      val s = vs.sorted
      s(math.max(0, math.ceil(0.5 * s.length).toInt - 1))
    }
    val expected = data.groupBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2)
      val med = discMedian(vs)
      val mad = discMedian(vs.map(v => math.abs(v - med)))
      val outl = vs.count(v => math.abs(v - med) > 3.0 * mad)
      g -> (med, mad, outl.toLong)
    }
    val got = Percentiles.medianMadDiscrete(df, "g", "v", outlierK = 3.0,
      nBuckets = 16, maxCollect = 48)
      .orderBy("g").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("null values are excluded like SQL percentile semantics") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)
    ).toDF("g", "v")
    val out = Percentiles.exactByRank(df, "g", "v", Seq(0.5), Seq("p50"))
      .orderBy("g").collect()
    // group b is all-null → omitted; a's median over (1, 3) = 2
    assert(out.length == 1)
    assert(out(0).getString(0) == "a" && math.abs(out(0).getDouble(1) - 2.0) < 1e-9)
  }
}
