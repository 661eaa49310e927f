package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics2

class Analytics2Spec extends AnyFunSuite with SparkSpec {

  test("q74 longest-streak histogram matches a driver-side brute force") {
    val got = Analytics2.q74Streaks(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val rows = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val longest = rows.groupBy(_._1).map { case (_, ms) =>
      val sorted = ms.map(_._2).distinct.sorted
      // brute scan: longest run of +1 steps
      var best = 1; var cur = 1
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        if (pair(1) == pair(0) + 1) { cur += 1; best = math.max(best, cur) }
        else cur = 1
      }
      best
    }
    val expect = longest.groupBy(identity)
      .map { case (k, v) => k.toLong -> v.size.toLong }
    assert(got == expect && got.nonEmpty)
  }

  test("q76 TWAP equals a driver-side step-function integration") {
    val got = Analytics2.q76Twap(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val rows = Tables.events(spark, sf)
      .select(col("event_type"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"),
        year(col("ts")).as("y"), col("ts"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getTimestamp(5)))
    val expect = rows.groupBy(_._1).flatMap { case (tpe, es) =>
      val sorted = es.sortBy(e => (e._6.getTime, e._3))
      val weighted = sorted.zip(sorted.drop(1)).map { case (cur, nxt) =>
        (cur._5, cur._4, nxt._2 - cur._2) // (year, cents, gap)
      }
      weighted.groupBy(_._1).map { case (y, ws) =>
        val n = ws.length.toLong
        val num = ws.map(w => w._2 * w._3).sum
        val den = ws.map(_._3).sum
        (tpe, y) -> (n, num.toDouble / den / 100.0)
      }
    }
    assert(got == expect && got.nonEmpty)
  }

  test("q77 transition matrix equals a driver-side session walk") {
    val got = Analytics2.q77Transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getTimestamp(4)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._5.getTime, e._3))
      sorted.zip(sorted.drop(1)).collect {
        case (a, b) if b._2 - a._2 <= 1800 => (a._4, b._4)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expect && got.nonEmpty)
    // shares per from_type sum to ~100
    val pcts = Analytics2.q77Transitions(spark, sf).collect()
      .groupBy(_.getString(0)).values
    pcts.foreach(g => assert(math.abs(g.map(_.getDouble(3)).sum - 100.0) < 0.01))
  }

  test("q75 sweep-line concurrency equals a brute per-day interval count") {
    val series = Analytics2.q75ActiveIntervals(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))

    val starts = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), to_date(col("o_orderdate")).as("d0"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    // brute force: a sampled day's concurrency = orders of that status
    // whose [d0, d0+14] window covers the day
    val sample = series.zipWithIndex.filter(_._2 % 97 == 0).map(_._1)
    sample.foreach { case (st, d, n) =>
      val brute = starts.count { case (s, d0) =>
        s == st && !d.isBefore(d0) && !d.isAfter(d0.plusDays(14))
      }
      assert(brute.toLong == n, s"status $st day $d: brute $brute vs sweep $n")
    }
    // series never goes negative and each status ends at zero
    series.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).forall(_ >= 0))
      assert(rows.maxBy(_._2.toEpochDay)._3 == 0L)
    }
  }
}
