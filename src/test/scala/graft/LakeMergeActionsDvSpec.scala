package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake
import graft.sources.GraftLake.MergeClause

/** Merge-on-read FLEXIBLE MERGE via deletion vectors: mergeActions'
  * clause semantics (computed SET, matched DELETE, conditional
  * INSERT, NOT MATCHED BY SOURCE) with mergeDv's write posture — one
  * atomic `updatedv` commit, position sidecar over exactly the
  * updated+deleted rows, O(affected rows) append, zero set rewrites.
  * The headline equivalence test pins mergeActionsDv ≡ mergeActions
  * row-for-row on the same inputs.
  */
class LakeMergeActionsDvSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-madv").resolve("t").toString

  private def rows(path: String): Set[(Long, Long, Long)] =
    GraftLake.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // The MergeActionsSpec headline clause mix — computed SET, failed-
  // condition DELETE, conditional INSERT, by-source DELETE.
  private val mixedClauses = Seq(
    MergeClause("matched", "update", Some("s.sv >= 1100"),
      Seq("v" -> "t.v + s.sv")),
    MergeClause("matched", "delete", None),
    MergeClause("notMatched", "insert", Some("s.id % 2 = 0"),
      Seq("id" -> "s.id", "grp" -> "-1", "v" -> "s.sv")),
    MergeClause("bySource", "delete", Some("t.grp = 0")))

  test("mergeActionsDv lands the exact mergeActions state — via a sidecar, zero rewrites") {
    import spark.implicits._
    val pathCow = freshTable()
    val pathDv = freshTable()
    val base = (1L to 12L).map(i => (i, i % 3, i * 10)).toDF("id", "grp", "v")
    GraftLake.create(base, pathCow, Some("id"))
    GraftLake.create(base, pathDv, Some("id"))
    val src = (9L to 16L).map(i => (i, i * 100)).toDF("id", "sv")
    GraftLake.mergeActions(spark, pathCow, src, Seq("id"), "id", mixedClauses)
    val liveBefore = GraftLake.snapshot(pathDv).live.map(_.set).toSet
    val (v, nUpd, nDel, nIns) = GraftLake.mergeActionsDv(
      spark, pathDv, src, Seq("id"), "id", mixedClauses)
    // Same logical state through both routes.
    assert(rows(pathDv) == rows(pathCow))
    // matched 11,12 update; matched 9,10 + by-source 3,6 delete;
    // source evens 14,16 insert.
    assert(nUpd == 2L && nDel == 4L && nIns == 2L)
    // DV posture: ONE commit, base sets untouched, one sidecar + one
    // appended set — where the CoW route rewrote its hit sets.
    val after = GraftLake.snapshot(pathDv)
    assert(after.version == v)
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.live.size == liveBefore.size + 1)
    assert(after.tombstones.size == 1)
    // Compact materializes to the same state.
    GraftLake.compact(spark, pathDv, Seq("id"), numFiles = 2, Some("id"))
    assert(GraftLake.snapshot(pathDv).tombstones.isEmpty)
    assert(rows(pathDv) == rows(pathCow))
  }

  test("by-source clauses scan everything but mask only the affected rows") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 100L).map(i => (i, i % 10, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    val liveBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    // No source rows at all: a pure by-source sweep.
    val (_, nUpd, nDel, nIns) = GraftLake.mergeActionsDv(spark, path,
      Seq.empty[(Long, Long)].toDF("id", "sv"), Seq("id"), "id", Seq(
        MergeClause("bySource", "update", Some("t.grp = 3"),
          Seq("v" -> "-t.v")),
        MergeClause("bySource", "delete", Some("t.grp = 4"))))
    assert(nUpd == 10L && nDel == 10L && nIns == 0L)
    val after = GraftLake.snapshot(path)
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.tombstones.size == 1)
    val r = GraftLake.read(spark, path)
    assert(r.count() == 90)
    assert(r.filter(col("grp") === 4).count() == 0)
    assert(r.filter(col("v") < 0).count() == 10)
    assert(r.filter(col("grp") === 3 && col("v") >= 0).count() == 0)
  }

  test("pure-insert commits an append; pure-delete a tombstone; no-op commits nothing") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    val insOnly = Seq(MergeClause("notMatched", "insert", None,
      Seq("id" -> "s.id", "grp" -> "1", "v" -> "s.sv")))
    val (v1, _, _, n1) = GraftLake.mergeActionsDv(spark, path,
      Seq((11L, 110L)).toDF("id", "sv"), Seq("id"), "id", insOnly)
    assert(n1 == 1L)
    assert(GraftLake.commits(path).last.action == "append")
    assert(GraftLake.snapshot(path).tombstones.isEmpty)
    val delOnly = Seq(MergeClause("matched", "delete", None))
    val (v2, _, n2, _) = GraftLake.mergeActionsDv(spark, path,
      Seq((1L, 0L), (2L, 0L)).toDF("id", "sv"), Seq("id"), "id", delOnly)
    assert(n2 == 2L && v2 == v1 + 1)
    assert(GraftLake.commits(path).last.action == "tombstone")
    assert(GraftLake.read(spark, path).count() == 9)
    // A merge matching nothing at all commits nothing.
    val (v3, u3, d3, i3) = GraftLake.mergeActionsDv(spark, path,
      Seq((99L, 0L)).toDF("id", "sv"), Seq("id"), "id", delOnly)
    assert(v3 == v2 && u3 == 0L && d3 == 0L && i3 == 0L)
  }

  test("stacks atop outstanding DVs: only visible rows dispatch") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 20L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    GraftLake.deleteDv(spark, path, col("id") > 15)
    GraftLake.updateDv(spark, path, col("id") <= 3, Seq("v" -> lit(100L)))
    // ids 16..20 are invisible: they INSERT, not match; ids 1..3 match
    // on their post-image values.
    val src = Seq((1L, 0L), (16L, 0L)).toDF("id", "sv")
    val (_, nUpd, _, nIns) = GraftLake.mergeActionsDv(spark, path, src,
      Seq("id"), "id", Seq(
        MergeClause("matched", "update", Some("t.v = 100"),
          Seq("v" -> "t.v + 1")),
        MergeClause("notMatched", "insert", None,
          Seq("id" -> "s.id", "grp" -> "9", "v" -> "0"))))
    assert(nUpd == 1L && nIns == 1L)
    val r = GraftLake.read(spark, path)
    assert(r.filter(col("v") === 101).count() == 1)
    assert(r.filter(col("id") === 16).head.getLong(1) == 9L)
    assert(GraftLake.snapshot(path).tombstones.size == 3)
    GraftLake.compact(spark, path, Seq("id"), numFiles = 2, Some("id"))
    assert(GraftLake.read(spark, path).count() == 16)
  }

  test("CDF stages all four image kinds in the one commit") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    GraftLake.enableCdf(path)
    val v0 = GraftLake.latestVersion(path)
    GraftLake.mergeActionsDv(spark, path,
      Seq((1L, 50L), (2L, 50L), (11L, 50L)).toDF("id", "sv"),
      Seq("id"), "id", Seq(
        MergeClause("matched", "update", Some("s.id = 1"),
          Seq("v" -> "s.sv")),
        MergeClause("matched", "delete", None),
        MergeClause("notMatched", "insert", None,
          Seq("id" -> "s.id", "grp" -> "0", "v" -> "s.sv"))))
    val feed = GraftLake.changesTyped(spark, path, v0)
    assert(feed.filter(col("_change_type") === "update_preimage")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(feed.filter(col("_change_type") === "update_postimage")
      .head.getLong(2) == 50L)
    assert(feed.filter(col("_change_type") === "delete")
      .collect().map(_.getLong(0)).toSet == Set(2L))
    assert(feed.filter(col("_change_type") === "insert")
      .collect().map(_.getLong(0)).toSet == Set(11L))
  }

  test("cardinality, constraints, and exactly-once tags hold on the DV route") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    val upd = Seq(MergeClause("matched", "update", None, Seq("v" -> "s.sv")))
    intercept[Exception] {
      GraftLake.mergeActionsDv(spark, path,
        Seq((3L, 1L), (3L, 2L)).toDF("id", "sv"), Seq("id"), "id", upd)
    }
    GraftLake.addConstraint(spark, path, "v_pos", "v >= 0")
    val before = GraftLake.snapshot(path)
    intercept[Exception] {
      GraftLake.mergeActionsDv(spark, path,
        Seq((3L, -5L)).toDF("id", "sv"), Seq("id"), "id", upd)
    }
    assert(GraftLake.snapshot(path).version == before.version)
    val src = Seq((3L, 7L)).toDF("id", "sv")
    val (va, n1, _, _) = GraftLake.mergeActionsDv(spark, path, src,
      Seq("id"), "id", upd, tag = Some("madv-1"))
    assert(n1 == 1L)
    val (vb, n2, _, _) = GraftLake.mergeActionsDv(spark, path, src,
      Seq("id"), "id", upd, tag = Some("madv-1"))
    assert(vb == va && n2 == 0L)
    assert(GraftLake.read(spark, path)
      .filter(col("id") === 3 && col("v") === 7).count() == 1)
  }

  test("SQL MERGE with general clauses routes onto the DV executor for opted-in tables") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 12L).map(i => (i, i % 3, i * 10))
      .toDF("id", "grp", "v"), path, Some("id"))
    GraftLake.enableDeletionVectors(path)
    graft.sources.LakeSql.register(spark, path, "madv_t", "id")
    val liveBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    (9L to 16L).map(i => (i, i * 100)).toDF("id", "sv")
      .createOrReplaceTempView("madv_src")
    spark.sql(
      """MERGE INTO madv_t AS t USING madv_src AS s ON t.id = s.id
        |WHEN MATCHED AND s.sv >= 1100 THEN UPDATE SET v = t.v + s.sv
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.id % 2 = 0 THEN
        |  INSERT (id, grp, v) VALUES (s.id, -1, s.sv)
        |WHEN NOT MATCHED BY SOURCE AND t.grp = 0 THEN DELETE""".stripMargin)
    val after = GraftLake.snapshot(path)
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.tombstones.size == 1)
    assert(rows(path) == Set(
      (1L, 1L, 10L), (2L, 2L, 20L), (4L, 1L, 40L), (5L, 2L, 50L),
      (7L, 1L, 70L), (8L, 2L, 80L),
      (11L, 2L, 110L + 1100L), (12L, 0L, 120L + 1200L),
      (14L, -1L, 1400L), (16L, -1L, 1600L)))
  }

  test("matched-only merges search span-overlapping sets only") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 100L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    GraftLake.append((101L to 200L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    GraftLake.append((201L to 300L).map(i => (i, 0L, i)).toDF("id", "grp", "v"),
      path, Some("id"))
    val (_, nUpd, _, _) = GraftLake.mergeActionsDv(spark, path,
      (150L to 160L).map(i => (i, 0L)).toDF("id", "sv"), Seq("id"), "id",
      Seq(MergeClause("matched", "update", None, Seq("v" -> "t.v + 1000"))))
    assert(nUpd == 11L)
    assert(GraftLake.lastDvScanSets == (1, 2))
    assert(GraftLake.read(spark, path).filter(col("v") > 1000).count() == 11)
  }
}
