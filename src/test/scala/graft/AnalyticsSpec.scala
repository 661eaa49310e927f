package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite with SparkSpec {

  test("q62 funnel equals a brute per-user event-sequence scan") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000 +
        r.getTimestamp(2).getNanos / 1000 % 1000))
    val byUser = events.groupBy(_._1)
    def firstAfter(evs: Seq[(Long, String, Long)], tpe: String, after: Long): Option[Long] =
      evs.filter(e => e._2 == tpe && e._3 > after).map(_._3).minOption
    var (nV, nC, nP) = (0L, 0L, 0L)
    byUser.foreach { case (_, evs) =>
      val v = evs.filter(_._2 == "view").map(_._3).minOption
      v.foreach { tv =>
        nV += 1
        firstAfter(evs.toSeq, "click", tv).foreach { tc =>
          nC += 1
          firstAfter(evs.toSeq, "purchase", tc).foreach(_ => nP += 1)
        }
      }
    }
    val got = Analytics.q62Funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "stage1_view" -> nV, "stage2_click" -> nC, "stage3_purchase" -> nP))
    // the funnel only narrows
    assert(nV >= nC && nC >= nP)
  }

  test("q63 cohort: day-0 retention counts every cohort's full size") {
    val rows = Analytics.q63Cohort(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val events = Tables.events(spark, sf)
    val cohortSizes = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"))
      .groupBy("d0").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // k=0 row of each cohort == the cohort's size (everyone is active
    // on their own first day, by construction of first-seen)
    val k0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(k0 == cohortSizes)
    // retention never exceeds cohort size at any offset
    rows.foreach { case (d0, _, n) => assert(n <= cohortSizes(d0)) }
  }

  test("q64 histogram partitions all orders exactly once into buckets") {
    val rows = Analytics.q64Histogram(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sf).count())
    // bucket arithmetic: every bucket's cents sit inside its range
    rows.foreach { r =>
      val (bucket, n, cents) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cents >= bucket * 100000L * n && cents < (bucket + 1) * 100000L * n)
    }
  }

  test("q65 adjacency pattern equals a brute per-user consecutive-triple scan") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.toSeq.sortBy(e => (e._3.getTime, e._3.getNanos, e._4))
      sorted.sliding(3).collect {
        case Seq(a, b, c) if a._2 == "view" && b._2 == "click" && c._2 == "purchase" =>
          c._3.toLocalDateTime.toLocalDate.toString
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Analytics.q65PatternMatch(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q66 histogram-path discrete percentiles equal the SQL-surface builtin") {
    val a = graft.operators.Analytics.q66PercentileDisc(spark, sf)
      .collect().map(_.toString).toSeq
    val b = graft.operators.Analytics.q66SqlSurface(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q68 semi-additive: last-per-month then sum equals a brute fold") {
    def toLdt(v: Any): java.time.LocalDateTime = v match {
      case t: java.sql.Timestamp => t.toLocalDateTime
      case d: java.sql.Date => d.toLocalDate.atStartOfDay
      case l: java.time.LocalDateTime => l
    }
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), toLdt(r.get(1)), r.getLong(2), r.getLong(3)))
    val want = orders
      .groupBy { case (ck, d, _, _) => (ck, d.getYear, d.getMonthValue) }
      .toSeq // a Map here would collapse same-(y,m) keys across customers
      .map { case ((_, y, m), rs) =>
        val last = rs.maxBy { case (_, d, ok, _) =>
          (d.toEpochSecond(java.time.ZoneOffset.UTC), ok) }
        ((y, m), last._4)
      }
      .groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    val got = graft.operators.Analytics.q68SemiAdditive(spark, sf).collect()
      .map { r =>
        val d = r.get(0) match {
          case sd: java.sql.Date => sd.toLocalDate
          case ld: java.time.LocalDate => ld
        }
        ((d.getYear, d.getMonthValue), (r.getLong(1), r.getLong(2)))
      }.toMap
    assert(got == want)
  }

  test("q71 anomaly days equal a BigInt replay of the square-free 2-sigma test") {
    val dayCents = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => ((r.getString(0), r.get(1).toString), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = dayCents.keys.groupBy(_._1).flatMap { case (tpe, keys) =>
      val xs = keys.toSeq.map(k => (k._2, BigInt(dayCents(k))))
      val n = BigInt(xs.size)
      val s = xs.map(_._2).sum
      val q = xs.map(x => x._2 * x._2).sum
      xs.collect {
        case (d, x) if (x * n - s) > 0 &&
          (x * n - s).pow(2) * (n - 1) > 4 * n * (n * q - s * s) =>
          (tpe, d, dayCents((tpe, d)))
      }
    }.toSet
    val got = graft.operators.Analytics.q71AnomalyDays(spark, sf).collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "the replay itself must flag at least one spike day")
  }

  test("q71 magnitude fence: DECIMAL(38)-overflowing day totals refuse loudly") {
    import spark.implicits._
    // Small magnitudes pass through the fence untouched.
    val ok = ((1 to 10).map(i => ("a", f"2024-01-$i%02d", 100L + i)) :+
      (("a", "2024-01-11", 5000L)))
      .toDF("event_type", "d", "x")
    assert(Analytics.anomalyFrom(ok).collect().nonEmpty)
    // A near-Long.Max day total would overflow num^2*(n-1) past
    // DECIMAL(38,0) — non-ANSI Spark would NULL it and silently drop
    // the day; the fence must throw instead.
    val huge = Seq(("a", "2024-01-01", 5000000000000000000L),
      ("a", "2024-01-02", 4000000000000000000L),
      ("a", "2024-01-03", 4100000000000000000L),
      ("a", "2024-01-04", 4200000000000000000L))
      .toDF("event_type", "d", "x")
    intercept[IllegalArgumentException] { Analytics.anomalyFrom(huge) }
  }

  test("q72 sliding approx distinct: bound holds and the exact side equals q50") {
    val got = graft.operators.ApproxGates.q72SlidingApproxDistinct(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getBoolean(3)), "every estimate inside the 5%+2 envelope")
    val q50r = graft.operators.Relational3.q50WindowDistinct(spark, sf).collect()
      .map(r => ((r.getString(0), r.get(1).toString), r.getLong(2))).toMap
    got.foreach(r =>
      assert(r.getLong(2) == q50r((r.getString(0), r.get(1).toString))))
  }

  test("st16 maintained day totals are split-invariant (any batch assignment)") {
    import graft.operators.Analytics
    import graft.streaming.AnomalyStream
    val events = Tables.events(spark, sf)
    // Shuffled assignment — batches are NOT time ranges, so days are
    // split across batches; additive folding must not care.
    val parts = (0 until 4).map(i =>
      events.filter(pmod(col("event_id"), lit(4)) === i))
    val folded = parts.map(Analytics.dailyCents)
      .reduce(AnomalyStream.mergeDaily(_, _))
    val got = Analytics.anomalyFrom(folded).collect().map(_.toString).toSeq
    val want = Analytics.q71AnomalyDays(spark, sf).collect().map(_.toString).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q72 RANGE frame gives date semantics across absent days") {
    import spark.implicits._
    // Two bursts 10 days apart: day-0 users {1,2}, day-10 users {2,3}.
    // A ROWS(-6,0) frame would wrongly union them (adjacent rows); the
    // RANGE frame must keep the windows disjoint.
    val dir = java.nio.file.Files.createTempDirectory("graft-q72").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val ts10 = java.sql.Timestamp.valueOf("2024-03-11 12:00:00")
    Seq(
      (1L, ts0, 1L, "view", 1.0, "{}"),
      (2L, ts0, 2L, "view", 1.0, "{}"),
      (3L, ts10, 2L, "view", 1.0, "{}"),
      (4L, ts10, 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.operators.ApproxGates.q72SlidingApproxDistinct(spark, dir)
      .collect().map(r => r.get(1).toString -> r.getLong(2)).toMap
    assert(out == Map("2024-03-01" -> 2L, "2024-03-11" -> 2L),
      s"windows must not bleed across the gap: $out")
  }
}
