package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Temporal zone maps: DATE/TIMESTAMP stats columns record exact
  * integer images (epoch days / epoch micros), and date/timestamp
  * predicates prune mutations through the same manifest tests integer
  * keys use — the "one day's predicate opens one day's sets" shape a
  * time-partitioned 100 TB table needs.
  */
class LakeTemporalStatsSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-temporal").resolve("t").toString

  /** Three one-year file-sets of (id, ts, day, v) rows, 1993-1995. */
  private def seed(p: String): Unit = {
    import spark.implicits._
    val df = (1 to 90).map { i =>
      val yr = 1993 + (i - 1) / 30
      val day = f"$yr-01-${(i - 1) % 28 + 1}%02d"
      (i.toLong, java.sql.Timestamp.valueOf(s"$day 12:00:00"),
        java.sql.Date.valueOf(day), i * 10L)
    }.toDF("id", "ts", "day", "v")
    GraftLake.create(df.filter(year(col("ts")) === 1993), p,
      statsCols = Seq("id", "ts", "day"))
    Seq(1994, 1995).foreach(yr => GraftLake.append(
      df.filter(year(col("ts")) === yr), p, statsCols = Seq("id", "ts", "day")))
  }

  test("DATE/TIMESTAMP stats record exact epoch days / micros") {
    val p = fresh()
    seed(p)
    val sets = GraftLake.snapshot(p).live
    assert(sets.size == 3)
    // 1993 set: day stats span [1993-01-01, 1993-01-28] in epoch days
    val d93 = sets.flatMap(_.statsFor("day")).map(_.min).min
    assert(d93 == java.time.LocalDate.parse("1993-01-01").toEpochDay)
    // ts stats are micros: 1995 max == 1995-01-28 12:00:00 local micros
    val t95 = sets.flatMap(_.statsFor("ts")).map(_.max).max
    val want = java.sql.Timestamp.valueOf("1995-01-28 12:00:00")
    assert(t95 == want.getTime * 1000L)
  }

  test("timestamp predicate prunes deleteDv to the one overlapping set") {
    val p = fresh()
    seed(p)
    GraftLake.deleteDv(spark, p,
      expr("ts >= TIMESTAMP'1994-01-01 00:00:00' AND " +
        "ts < TIMESTAMP'1995-01-01 00:00:00'"))
    assert(GraftLake.lastDvScanSets == ((1, 2)),
      s"expected 1 scanned / 2 skipped, got ${GraftLake.lastDvScanSets}")
    assert(GraftLake.read(spark, p).filter(year(col("ts")) === 1994).count() == 0)
    assert(GraftLake.read(spark, p).count() == 60)
  }

  test("date predicate prunes copy-on-write delete; string literal too") {
    val p = fresh()
    seed(p)
    GraftLake.delete(spark, p, expr("day < DATE'1994-01-01'"), None)
    assert(GraftLake.lastCowScanSets._1 == 1,
      s"expected 1 candidate set, got ${GraftLake.lastCowScanSets}")
    assert(GraftLake.read(spark, p).count() == 60)
    // the whole 1993 set died: pure by-reference removal, no empty
    // stat-less rewritten set left behind to poison later pruning
    assert(GraftLake.commits(p).last.add.isEmpty)
    assert(GraftLake.snapshot(p).live.size == 2)
    // string comparison binds through Spark's own cast rule
    GraftLake.delete(spark, p, expr("day = '1995-01-03'"), None)
    assert(GraftLake.lastCowScanSets._1 == 1)
    assert(GraftLake.read(spark, p).count() == 59)
  }

  test("temporal statsCol span-prunes merge like an integral key") {
    import spark.implicits._
    val p = fresh()
    seed(p)
    // updates touch only 1995 rows; ts is functionally dependent on id
    val upd = (61 to 70).map { i =>
      val day = f"1995-01-${(i - 1) % 28 + 1}%02d"
      (i.toLong, java.sql.Timestamp.valueOf(s"$day 12:00:00"),
        java.sql.Date.valueOf(day), 999L)
    }.toDF("id", "ts", "day", "v")
    val (_, rewritten, kept) = GraftLake.merge(spark, p, upd, Seq("id"), "ts")
    assert(rewritten == 1 && kept == 2,
      s"expected 1 rewritten / 2 kept, got ($rewritten, $kept)")
    assert(GraftLake.read(spark, p).filter(col("v") === 999L).count() == 10)
  }

  test("TIMESTAMP_NTZ stats are LOCAL micros; NTZ/string literals prune") {
    import spark.implicits._
    val p = fresh()
    val df = (1 to 60).map { i =>
      val yr = 1993 + (i - 1) / 30
      (i.toLong, s"$yr-01-${"%02d".format((i - 1) % 28 + 1)} 12:00:00.250")
    }.toDF("id", "s").withColumn("nts", expr("CAST(s AS TIMESTAMP_NTZ)"))
      .drop("s")
    GraftLake.create(df.filter(col("id") <= 30), p, statsCols = Seq("nts"))
    GraftLake.append(df.filter(col("id") > 30), p, statsCols = Seq("nts"))
    val mins = GraftLake.snapshot(p).live.flatMap(_.statsFor("nts")).map(_.min)
    // 1993-01-01 12:00:00.250 local micros, timezone-independent
    val d93 = java.time.LocalDate.parse("1993-01-01").toEpochDay
    assert(mins.min == (d93 * 86400L + 12L * 3600L) * 1000000L + 250000L)
    // string literal binds the wall-clock constraint: one set scanned
    GraftLake.delete(spark, p, expr("nts < '1994-01-01 00:00:00'"), None)
    assert(GraftLake.lastCowScanSets == ((1, 1)))
    assert(GraftLake.read(spark, p).count() == 30)
    // NTZ-typed literal binds too
    GraftLake.delete(spark, p,
      expr("nts >= TIMESTAMP_NTZ'1994-01-15 00:00:00'"), None)
    assert(GraftLake.lastCowScanSets._1 == 1)
  }

  test("a cast over a temporal column never yields a wrong-unit constraint") {
    val p = fresh()
    seed(p)
    // CAST(ts AS BIGINT) is SECONDS — must NOT bind a micros
    // constraint; everything scans (conservative), nothing misdeletes.
    GraftLake.delete(spark, p, expr("CAST(ts AS BIGINT) < 757382400"), None)
    assert(GraftLake.lastCowScanSets._1 == 3) // no pruning claimed
    // and the delete itself is exact: survivors == NOT(pred) replay
    assert(GraftLake.read(spark, p).count() ==
      GraftLake.readAt(spark, p, 2)
        .filter(expr("NOT (CAST(ts AS BIGINT) < 757382400)")).count())
  }

  test("legacy untagged temporal stats are dropped, never unit-mismatched") {
    import scala.jdk.CollectionConverters._
    val p = fresh()
    seed(p)
    // Simulate a table written BEFORE the stats encoding was tagged:
    // strip every `"enc":2` from the log and re-seal the crc. Those
    // entries are indistinguishable from legacy seconds-domain
    // TIMESTAMP stats, so the fold must treat them as ABSENT — a
    // micros-domain span probe against seconds stats would conclude
    // "no overlap" and silently skip live sets.
    val logDir = java.nio.file.Paths.get(p, "_graft_log")
    Files.list(logDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json")).foreach { f =>
        val lines = Files.readString(f).split("\n").map { line =>
          val body0 = line.substring(0, line.lastIndexOf(""","crc":"""))
          val body = body0.replace(""","enc":2""", "")
          val c = new java.util.zip.CRC32()
          c.update(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          body + s""","crc":${c.getValue}}"""
        }
        Files.writeString(f, lines.mkString("\n"))
      }
    val sets = GraftLake.snapshot(p).live
    assert(sets.size == 3)
    // temporal stats gone (conservative), integral stats survive
    assert(sets.forall(_.statsFor("ts").isEmpty))
    assert(sets.forall(_.statsFor("day").isEmpty))
    assert(sets.forall(_.statsFor("id").nonEmpty))
    // the 1994 delete now scans ALL sets — no silent skip, right answer
    GraftLake.deleteDv(spark, p,
      expr("ts >= TIMESTAMP'1994-01-01 00:00:00' AND " +
        "ts < TIMESTAMP'1995-01-01 00:00:00'"))
    assert(GraftLake.lastDvScanSets == ((3, 0)),
      s"expected conservative 3 scanned / 0 skipped, got ${GraftLake.lastDvScanSets}")
    assert(GraftLake.read(spark, p).count() == 60)
    assert(GraftLake.read(spark, p).filter(year(col("ts")) === 1994).count() == 0)
  }
}
