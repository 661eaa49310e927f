package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join picks latest right row at-or-before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")), // after both rights of key 10
      (2L, 10L, ts("2024-01-01 10:00:00")), // exactly at second right (inclusive)
      (3L, 10L, ts("2024-01-01 08:00:00")), // before 10:00, after 09:00
      (4L, 10L, ts("2024-01-01 01:00:00")), // before all rights -> null
      (5L, 99L, ts("2024-01-01 12:00:00")) // key with no right rows -> null
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 05:00:00"), 100L),
      (10L, ts("2024-01-01 10:00:00"), 200L)
    ).toDF("rk", "rt", "payload")

    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .orderBy("event_id").collect()

    assert(out.map(r => Option(r.getAs[java.lang.Long]("payload"))).toSeq == Seq(
      Some(200L), Some(200L), Some(100L), None, None))
  }

  test("as-of join tolerance bound nulls out stale matches") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")), // 30 min after right -> in tolerance
      (2L, 10L, ts("2024-01-01 12:00:00")) // 2 h after right -> too stale
    ).toDF("event_id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 10:00:00"), 100L)).toDF("rk", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"),
      toleranceUs = Some(3600L * 1000000L))
      .orderBy("event_id").collect()
    assert(Option(out(0).getAs[java.lang.Long]("payload")).contains(100L))
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
  }

  test("native as-of handles string keys and null left times/keys") {
    import spark.implicits._
    // String keys exercise the owned-copy path (held UTF8String must not
    // re-point at the sort iterator's reused buffer); null time/key left
    // rows must degrade to a null payload, not throw.
    val left = Seq(
      (1L, "a", ts("2024-01-01 12:00:00")),
      (2L, "b", ts("2024-01-01 12:00:00")),
      (3L, "b", null.asInstanceOf[Timestamp]),
      (4L, null.asInstanceOf[String], ts("2024-01-01 12:00:00")),
      (5L, "c", ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), 100L),
      ("b", ts("2024-01-01 11:00:00"), 200L)
    ).toDF("rk", "rt", "payload")

    val out = AsOfJoin.asOfNative(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Long]("payload"))).toSeq == Seq(
      Some(100L), Some(200L), None, None, None))
  }

  test("native as-of tolerance works on integral (raw-unit) time columns") {
    import spark.implicits._
    val left = Seq((1L, 10L, 130L), (2L, 10L, 500L)).toDF("event_id", "k", "t")
    val right = Seq((10L, 100L, 7L)).toDF("rk", "rt", "payload")
    val out = AsOfJoin.asOfNative(left, right, "k", "rk", "t", "rt", Seq("payload"),
      toleranceUs = Some(50L)).orderBy("event_id").collect()
    assert(Option(out(0).getAs[java.lang.Long]("payload")).contains(7L))
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
    // Union/window form agrees on integral times (no seconds misscale).
    val outU = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"),
      toleranceUs = Some(50L)).orderBy("event_id").collect()
    assert(Option(outU(0).getAs[java.lang.Long]("payload")).contains(7L))
    assert(outU(1).isNullAt(outU(1).fieldIndex("payload")))
  }

  test("as-of join preserves every left row exactly once") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong, (i % 3).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00")))
      .toDF("event_id", "k", "t")
    val right = Seq((0L, ts("2024-01-01 00:00:00"), 7L)).toDF("rk", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
    assert(out.count() == 50)
    assert(out.select("event_id").distinct().count() == 50)
  }
}
