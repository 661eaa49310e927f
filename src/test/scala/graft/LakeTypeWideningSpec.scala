package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Type widening (Delta's type-widening table feature): a wide
  * writer evolves the schema along the lossless ladder (byte < short
  * < int < long, float < double) with ZERO bytes rewritten; narrow
  * file-sets serve the wide type through a pure cast in the
  * DataFrame read AND the DSv2 batch scan; narrow writers against an
  * already-wide table land as written and read up; anything off the
  * ladder refuses loudly.
  */
class LakeTypeWideningSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-widen").resolve("t").toString

  test("int->long and float->double widen in place; values exact on both read paths") {
    import spark.implicits._
    val path = freshTable()
    val narrow = (1 to 50).map(i => (i, s"r$i", i * 1.5f))
      .toDF("k", "tag", "x")
    GraftLake.create(narrow, path)
    val setsBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    val wide = (51L to 80L).map(i => (i, s"r$i", i * 1.5d))
      .toDF("k", "tag", "x")
    GraftLake.append(wide, path)
    // schema widened, narrow era's file-set untouched on disk
    val st = StructType.fromDDL(GraftLake.snapshot(path).schemaDdl)
    assert(st("k").dataType == LongType && st("x").dataType == DoubleType)
    assert(setsBefore.subsetOf(GraftLake.snapshot(path).live.map(_.set).toSet))
    val got = GraftLake.read(spark, path)
      .select("k", "tag", "x").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    val expect = ((1 to 50).map(i => (i.toLong, s"r$i", (i * 1.5f).toDouble)) ++
      (51L to 80L).map(i => (i, s"r$i", i * 1.5d))).sortBy(_._1)
    assert(got.toSeq == expect)
    // the DSv2 batch scan decodes narrow files under their written
    // types and widens per value — same rows, same schema
    val dsv = spark.read.format("graftlake").load(path)
      .select("k", "tag", "x").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(dsv.toSeq == expect)
  }

  test("a narrow late writer lands against the widened schema and reads up") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create(Seq((1L, 10L)).toDF("k", "v"), path)
    GraftLake.append(Seq((2, 20)).toDF("k", "v"), path) // int writer
    val st = StructType.fromDDL(GraftLake.snapshot(path).schemaDdl)
    assert(st("k").dataType == LongType && st("v").dataType == LongType)
    assert(GraftLake.read(spark, path).as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
  }

  test("zone-map stats stay sound across the widening (value domain is unchanged)") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1 to 100).map(i => (i, i)).toDF("k", "v"), path,
      statsCols = Seq("k"))
    GraftLake.append((101L to 200L).map(i => (i, i)).toDF("k", "v"), path,
      statsCols = Seq("k"))
    val (df, scanned, skipped) =
      GraftLake.readPruned(spark, path, Seq(("k", 150L, 160L)))
    assert(scanned == 1 && skipped == 1)
    assert(df.filter(col("k").between(150, 160)).count() == 11)
  }

  test("off-ladder evolution refuses loudly; long->int narrowing does not shrink the schema") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create(Seq((1L, "a")).toDF("k", "s"), path)
    val e = intercept[IllegalArgumentException] {
      GraftLake.append(Seq(("x", "b")).toDF("k", "s"), path)
    }
    assert(e.getMessage.contains("cannot change type"))
    // string->long is equally refused in the other direction
    val path2 = freshTable()
    GraftLake.create(Seq(("x", "b")).toDF("k", "s"), path2)
    intercept[IllegalArgumentException] {
      GraftLake.append(Seq((1L, "a")).toDF("k", "s"), path2)
    }
  }

  test("date -> timestamp_ntz widens; both read paths serve midnight of the day") {
    import spark.implicits._
    val path = freshTable()
    val dates = Seq("1994-01-05", "1995-06-30").map(java.sql.Date.valueOf)
    GraftLake.create(dates.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("k", "ts"), path)
    // a writer arriving with TIMESTAMP_NTZ widens the schema in place
    val ntz = Seq((2L, java.time.LocalDateTime.of(1996, 3, 4, 12, 30)))
      .toDF("k", "ts")
    GraftLake.append(ntz, path)
    val st = StructType.fromDDL(GraftLake.snapshot(path).schemaDdl)
    assert(st("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val expect = Set("1994-01-05T00:00", "1995-06-30T00:00",
      "1996-03-04T12:30")
    val api = GraftLake.read(spark, path).select(col("ts")).collect()
      .map(_.getAs[java.time.LocalDateTime](0).toString).toSet
    assert(api == expect)
    val dsv = spark.read.format("graftlake").load(path)
      .select(col("ts")).collect()
      .map(_.getAs[java.time.LocalDateTime](0).toString).toSet
    assert(dsv == expect)
    // a DATE writer against the widened table is the narrow-late-
    // writer case: lands narrow, reads up as midnight
    GraftLake.append(
      Seq((9L, java.sql.Date.valueOf("1997-02-03"))).toDF("k", "ts"), path)
    assert(GraftLake.read(spark, path).filter(col("k") === 9L)
      .head.getAs[java.time.LocalDateTime]("ts").toString ==
      "1997-02-03T00:00")
  }

  test("decimal precision/scale growth widens; shrinking either budget refuses") {
    import spark.implicits._
    val path = freshTable()
    val d1 = Seq((1L, BigDecimal("12.34"))).toDF("k", "d")
      .select(col("k"), col("d").cast("decimal(6,2)").as("d"))
    GraftLake.create(d1, path)
    // (6,2) -> (10,4): scale +2, integer digits 4 -> 6 — lossless
    val d2 = Seq((2L, BigDecimal("12345.6789"))).toDF("k", "d")
      .select(col("k"), col("d").cast("decimal(10,4)").as("d"))
    GraftLake.append(d2, path)
    val st = StructType.fromDDL(GraftLake.snapshot(path).schemaDdl)
    assert(st("d").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 4))
    val got = GraftLake.read(spark, path).select(col("d")).collect()
      .map(_.getDecimal(0).toPlainString).toSet
    assert(got == Set("12.3400", "12345.6789"))
    // shrinking the integer-digit budget refuses: (10,4) -> (10,6)
    // keeps precision but drops integer digits 6 -> 4
    intercept[IllegalArgumentException] {
      GraftLake.append(
        Seq((3L, BigDecimal("1.5"))).toDF("k", "d")
          .select(col("k"), col("d").cast("decimal(10,6)").as("d")), path)
    }
    // narrow decimal writers land against the wide schema and read up
    GraftLake.append(
      Seq((4L, BigDecimal("99.99"))).toDF("k", "d")
        .select(col("k"), col("d").cast("decimal(6,2)").as("d")), path)
    assert(GraftLake.read(spark, path).count() == 3)
  }

  test("a narrow DATE writer against an ntz table records micros-domain stats") {
    import spark.implicits._
    import graft.sources.GraftLakeBatchSource
    val path = freshTable()
    GraftLake.create(
      Seq((1L, java.time.LocalDateTime.of(1996, 3, 4, 12, 30)))
        .toDF("k", "ts"), path, statsCols = Seq("ts"))
    // the narrow writer's stats must land in the TABLE's micros
    // domain — day-domain numbers under a micros probe would wrongly
    // SKIP this set (lost rows on pruned reads, lost DV deletes)
    GraftLake.append(
      Seq((2L, java.sql.Date.valueOf("1994-01-05"))).toDF("k", "ts"),
      path, statsCols = Seq("ts"))
    val probe = lit(java.time.LocalDateTime.of(1994, 1, 1, 0, 0))
    assert(spark.read.format("graftlake").load(path)
      .filter(col("ts") >= probe).count() == 2)
    // and the metadata MIN pushdown serves the true midnight, not a
    // day count reinterpreted as micros (1970-01-01T00:00:00.008770)
    GraftLakeBatchSource.lastAggPushed = false
    val m = spark.read.format("graftlake").load(path)
      .agg(min(col("ts"))).head.getAs[java.time.LocalDateTime](0)
    assert(GraftLakeBatchSource.lastAggPushed)
    assert(m.toString == "1994-01-05T00:00")
    // a DV delete pruned by the micros predicate still finds the row
    val (_, n) = GraftLake.deleteDv(spark, path, col("ts") >= probe &&
      col("ts") < lit(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)))
    assert(n == 1L)
    assert(GraftLake.read(spark, path).count() == 1)
  }

  test("date->ntz widens OVER day-domain zone maps: stats retag at fold time") {
    import spark.implicits._
    import graft.sources.GraftLakeBatchSource
    val path = freshTable()
    GraftLake.create(
      Seq((1L, java.sql.Date.valueOf("1994-01-05")),
        (2L, java.sql.Date.valueOf("1995-06-30"))).toDF("k", "ts"),
      path, statsCols = Seq("ts"))
    // the old refuse-while-statted fence is lifted: the per-set
    // schema is the stat's domain tag, and the fold scales day
    // images to micros (old files read as midnight)
    GraftLake.append(
      Seq((3L, java.time.LocalDateTime.of(1996, 3, 4, 12, 30)))
        .toDF("k", "ts"), path, statsCols = Seq("ts"))
    val snap = GraftLake.snapshot(path)
    assert(StructType.fromDDL(snap.schemaDdl)("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // the day-written set's served stats are now micros (midnights)
    val dayUs = java.time.LocalDate.parse("1994-01-05").toEpochDay *
      86400000000L
    assert(snap.live.exists(_.statsFor("ts").exists(_.min == dayUs)))
    // micros-domain probes neither wrongly SKIP (lost rows) ...
    def scan = spark.read.format("graftlake").load(path)
    val probe94 = lit(java.time.LocalDateTime.of(1994, 1, 1, 0, 0))
    assert(scan.filter(col("ts") >= probe94).count() == 3)
    assert(scan.filter(col("ts") >= probe94 &&
      col("ts") < lit(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)))
      .count() == 1)
    // ... nor wrongly KEEP what the scaled maps prove absent
    val (_, scanned, skipped) = GraftLake.readPruned(spark, path, Seq(
      ("ts", java.time.LocalDate.parse("2000-01-01").toEpochDay *
        86400000000L, Long.MaxValue)))
    assert(scanned == 0 && skipped == 2)
    // metadata MIN pushdown serves the true midnight, not a day
    // count reinterpreted as micros
    GraftLakeBatchSource.lastAggPushed = false
    assert(scan.agg(min(col("ts"))).head
      .getAs[java.time.LocalDateTime](0).toString == "1994-01-05T00:00")
    assert(GraftLakeBatchSource.lastAggPushed)
    // the lost-delete direction: a micros-pruned DV delete must still
    // find rows inside the day-written set
    val (_, n) = GraftLake.deleteDv(spark, path,
      col("ts") >= probe94 &&
        col("ts") < lit(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)))
    assert(n == 1L)
    assert(GraftLake.read(spark, path).count() == 2)
    // a checkpoint bakes RAW stats beside the set's own schema — the
    // reload must not double-scale
    GraftLake.checkpoint(path)
    val snap2 = GraftLake.snapshot(path)
    assert(snap2.live.exists(_.statsFor("ts").exists(_.min == dayUs)))
    assert(scan.filter(col("ts") >= probe94).count() == 2)
  }

  test("restore after date->ntz widening re-publishes RAW stats (no double-scale)") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create(
      Seq((1L, java.sql.Date.valueOf("1994-01-05")),
        (2L, java.sql.Date.valueOf("1995-06-30"))).toDF("k", "ts"),
      path, statsCols = Seq("ts"))
    GraftLake.append(
      Seq((3L, java.time.LocalDateTime.of(1996, 3, 4, 12, 30)))
        .toDF("k", "ts"), path, statsCols = Seq("ts")) // widen: v1
    GraftLake.append(
      Seq((4L, java.time.LocalDateTime.of(1997, 8, 9, 6, 0)))
        .toDF("k", "ts"), path, statsCols = Seq("ts")) // v2
    GraftLake.restore(spark, path, 1)
    // the restore commit's padd lines must carry RAW (day-domain)
    // stats under the day-era set's own schema tag — re-publishing
    // the fold-scaled micros under that tag would scale them AGAIN
    // on this snapshot (Long overflow, corrupt zone maps)
    val snap = GraftLake.snapshot(path)
    val dayUs = java.time.LocalDate.parse("1994-01-05").toEpochDay *
      86400000000L
    assert(snap.live.exists(_.statsFor("ts").exists(_.min == dayUs)))
    assert(snap.live.forall(_.statsFor("ts").forall(st =>
      st.min >= 0 && st.min <= st.max)))
    // pruned reads of the widened table still see the day-era set
    def scan = spark.read.format("graftlake").load(path)
    val probe94 = lit(java.time.LocalDateTime.of(1994, 1, 1, 0, 0))
    assert(scan.filter(col("ts") >= probe94).count() == 3)
    assert(scan.filter(col("ts") >= probe94 &&
      col("ts") < lit(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)))
      .count() == 1)
    // ... and the scaled maps still prove absence correctly
    val (_, scanned, skipped) = GraftLake.readPruned(spark, path, Seq(
      ("ts", java.time.LocalDate.parse("2000-01-01").toEpochDay *
        86400000000L, Long.MaxValue)))
    assert(scanned == 0 && skipped > 0)
  }

  test("shallow clone after date->ntz widening re-publishes RAW stats (no double-scale)") {
    import spark.implicits._
    val src = freshTable()
    GraftLake.create(
      Seq((1L, java.sql.Date.valueOf("1994-01-05")),
        (2L, java.sql.Date.valueOf("1995-06-30"))).toDF("k", "ts"),
      src, statsCols = Seq("ts"))
    GraftLake.append(
      Seq((3L, java.time.LocalDateTime.of(1996, 3, 4, 12, 30)))
        .toDF("k", "ts"), src, statsCols = Seq("ts"))
    val dst = freshTable()
    GraftLake.shallowClone(src, dst)
    val snap = GraftLake.snapshot(dst)
    val dayUs = java.time.LocalDate.parse("1994-01-05").toEpochDay *
      86400000000L
    assert(snap.live.exists(_.statsFor("ts").exists(_.min == dayUs)))
    assert(snap.live.forall(_.statsFor("ts").forall(st =>
      st.min >= 0 && st.min <= st.max)))
    def scan = spark.read.format("graftlake").load(dst)
    val probe94 = lit(java.time.LocalDateTime.of(1994, 1, 1, 0, 0))
    assert(scan.filter(col("ts") >= probe94).count() == 3)
    val (_, scanned, skipped) = GraftLake.readPruned(spark, dst, Seq(
      ("ts", java.time.LocalDate.parse("2000-01-01").toEpochDay *
        86400000000L, Long.MaxValue)))
    assert(scanned == 0 && skipped > 0)
  }

  test("date->ntz still refuses on a partition-LAYOUT column (day-image dirs)") {
    import spark.implicits._
    val path = freshTable()
    // the integral-image layout writer cannot lay a DATE column out,
    // so the fence guards the DECLARED layout (defense in depth)
    val df = Seq(
      (1L, java.sql.Date.valueOf("1994-01-05")),
      (2L, java.sql.Date.valueOf("1994-01-06"))).toDF("k", "d")
    GraftLake.create(df, path, statsCols = Seq("k"))
    GraftLake.setPartitionColumns(path, Seq("d"))
    val e = intercept[IllegalArgumentException] {
      GraftLake.append(
        Seq((3L, java.time.LocalDateTime.of(1996, 3, 4, 12, 30)))
          .toDF("k", "d"), path)
    }
    assert(e.getMessage.contains("partition-layout column"))
  }
}
