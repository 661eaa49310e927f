package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Column-mapping rename: zero-rewrite renames with name lineage. */
class LakeRenameSpec extends AnyFunSuite with SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
  }

  test("chained rename a->b->c still reads files written under a") {
    val t = tmp("ren-chain")
    GraftLake.create(base, t)
    GraftLake.renameColumn(t, "v", "v2")
    GraftLake.append(
      base.select((col("k") + 10).as("k"), col("s"), (col("v") + 100).as("v2")), t)
    GraftLake.renameColumn(t, "v2", "v3")
    val got = GraftLake.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(GraftLake.read(spark, t).schema.fieldNames.toSeq == Seq("k", "s", "v3"))
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L),
      (11L, 110L), (12L, 120L), (13L, 130L)))
    assert(GraftLake.renamesOf(t) == Map("v3" -> Seq("v2", "v")))
  }

  test("time travel resolves the lineage as of the read version") {
    val t = tmp("ren-tt")
    GraftLake.create(base, t)            // v0
    GraftLake.renameColumn(t, "v", "v2") // v1
    assert(GraftLake.readAt(spark, t, 0).schema.fieldNames.toSeq ==
      Seq("k", "s", "v"))
    assert(GraftLake.readAt(spark, t, 1).schema.fieldNames.toSeq ==
      Seq("k", "s", "v2"))
    assert(GraftLake.readAt(spark, t, 1).agg(sum("v2")).head.getLong(0) == 60L)
  }

  test("lineage survives a checkpoint") {
    val t = tmp("ren-ckpt")
    GraftLake.create(base, t)
    GraftLake.renameColumn(t, "v", "v2")
    GraftLake.checkpoint(t)
    // Force the checkpoint fast path: append AFTER the checkpoint so
    // the fold starts from the ckpt (which must carry the lineage).
    GraftLake.append(
      base.select((col("k") + 10).as("k"), col("s"), (col("v") + 100).as("v2")), t)
    val got = GraftLake.read(spark, t).agg(sum("v2")).head.getLong(0)
    assert(got == 60L + 360L)
    assert(GraftLake.renamesOf(t) == Map("v2" -> Seq("v")))
  }

  test("merge keyed through a renamed column rewrites correctly") {
    import spark.implicits._
    val t = tmp("ren-merge")
    GraftLake.create(base, t, Some("k"))
    GraftLake.renameColumn(t, "v", "v2")
    val upd = Seq((2L, "B", 999L), (4L, "d", 40L)).toDF("k", "s", "v2")
    GraftLake.merge(spark, t, upd, Seq("k"), "k")
    val got = GraftLake.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B", 999L),
      (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("shallow clone inherits the lineage and reads renamed data") {
    val t = tmp("ren-clone-src")
    val c = tmp("ren-clone-dst")
    GraftLake.create(base, t)
    GraftLake.renameColumn(t, "v", "v2")
    GraftLake.shallowClone(t, c)
    assert(GraftLake.read(spark, c).schema.fieldNames.toSeq == Seq("k", "s", "v2"))
    assert(GraftLake.read(spark, c).agg(sum("v2")).head.getLong(0) == 60L)
    GraftLake.dropClone(t, c)
  }

  test("changesSince feeds across rename commits in the delta") {
    val t = tmp("ren-cdc")
    GraftLake.create(base, t)            // v0
    GraftLake.renameColumn(t, "v", "v2") // v1 (metadata only)
    GraftLake.append(
      base.select((col("k") + 10).as("k"), col("s"), (col("v") + 100).as("v2")), t) // v2
    val delta = GraftLake.changesSince(spark, t, 0)
    assert(delta.select("_commit_version").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    assert(delta.agg(sum("v2")).head.getLong(0) == 360L)
  }

  test("rewrites after renaming a stats column re-record under the new name") {
    import spark.implicits._
    val t = tmp("ren-stats")
    // Stats zone map lives on v; rename it, then merge + compact —
    // both must translate the recorded dimension to the new name
    // instead of throwing on the vanished old one.
    GraftLake.create(base, t, Some("v"))
    GraftLake.renameColumn(t, "v", "v2")
    GraftLake.merge(spark, t,
      Seq((2L, "B", 999L)).toDF("k", "s", "v2"), Seq("k"), "k")
    GraftLake.compact(spark, t, Seq("k"), 1, Some("k"))
    val live = GraftLake.snapshot(t).live
    assert(live.flatMap(_.stats.map(_.col)).toSet.subsetOf(Set("v2", "k")),
      s"stats must carry CURRENT names, got ${live.flatMap(_.stats)}")
    assert(GraftLake.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 10L), (2L, 999L), (3L, 30L)))
  }

  test("rename refusals: missing, duplicate, constrained, tombstoned") {
    val t = tmp("ren-refuse")
    GraftLake.create(base, t, Some("k"))
    intercept[IllegalArgumentException] {
      GraftLake.renameColumn(t, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      GraftLake.renameColumn(t, "v", "s") // collides with existing
    }
    GraftLake.addConstraint(spark, t, "pos_v", "v >= 0")
    intercept[IllegalStateException] {
      GraftLake.renameColumn(t, "v", "v2") // constraint references v
    }
    GraftLake.dropConstraint(t, "pos_v")
    GraftLake.deleteMoR(spark, t, col("k") === 1L, "k")
    intercept[IllegalArgumentException] {
      GraftLake.renameColumn(t, "v", "v2") // outstanding tombstones
    }
    GraftLake.compact(spark, t, Seq("k"), 1)
    GraftLake.renameColumn(t, "v", "v2")   // now allowed
    assert(GraftLake.read(spark, t).schema.fieldNames.contains("v2"))
  }

  test("former-name fence: a renamed-away column cannot rejoin via evolution") {
    import spark.implicits._
    val t = tmp("ren-fence")
    GraftLake.create(base, t)
    GraftLake.renameColumn(t, "v", "v2")
    // The realistic trigger: a stale writer still emitting 'v'. Without
    // the fence, pre-rename sets would serve the same physical bytes
    // under BOTH logical v2 (lineage) and the re-added v (name hit).
    val stale = Seq((9L, "z", 90L, 900L)).toDF("k", "s", "v2", "v")
    val e = intercept[IllegalStateException] { GraftLake.append(stale, t) }
    assert(e.getMessage.contains("renamed away"))
    // A DIFFERENT new name evolves fine.
    GraftLake.append(Seq((9L, "z", 90L, 900L)).toDF("k", "s", "v2", "w"), t)
    assert(GraftLake.read(spark, t).schema.fieldNames.toSeq ==
      Seq("k", "s", "v2", "w"))
  }

  test("drop column: zero-rewrite, re-add refused, renamed-then-dropped fenced too") {
    import spark.implicits._
    val t = tmp("dropc")
    GraftLake.create(base, t)
    GraftLake.renameColumn(t, "v", "v2")   // v -> v2
    GraftLake.dropColumn(t, "v2")          // drop the renamed column
    assert(GraftLake.read(spark, t).columns.toSeq == Seq("k", "s"))
    // The WHOLE lineage (v2 and its former name v) is fenced: neither
    // can rejoin via evolution.
    intercept[IllegalStateException] {
      GraftLake.append(Seq((9L, "z", 1L)).toDF("k", "s", "v2"), t) }
    intercept[IllegalStateException] {
      GraftLake.append(Seq((9L, "z", 1L)).toDF("k", "s", "v"), t) }
    // A fresh name evolves fine, and data reads back untouched.
    GraftLake.append(Seq((9L, "z", 1L)).toDF("k", "s", "w"), t)
    assert(GraftLake.read(spark, t).count() == 4)
    // Lineage survives a checkpoint; pre-drop time travel still sees v2.
    GraftLake.checkpoint(t)
    intercept[IllegalStateException] {
      GraftLake.append(Seq((8L, "y", 2L)).toDF("k", "s", "v"), t) }
    assert(GraftLake.readAt(spark, t, 1).columns.contains("v2"))
    // Refusals: constraint-referenced and last-column drops.
    val t2 = tmp("dropc2")
    GraftLake.create(Seq((1L, 2L)).toDF("a", "b"), t2)
    GraftLake.addConstraint(spark, t2, "b_pos", "b > 0")
    intercept[IllegalStateException] { GraftLake.dropColumn(t2, "b") }
    GraftLake.dropConstraint(t2, "b_pos")
    GraftLake.dropColumn(t2, "b")
    intercept[IllegalArgumentException] { GraftLake.dropColumn(t2, "a") }
  }

  test("overwrite resets the lineage; the former name may then return") {
    import spark.implicits._
    val t = tmp("ren-ow")
    GraftLake.create(base, t)
    GraftLake.renameColumn(t, "v", "v2")
    assert(GraftLake.renamesOf(t) == Map("v2" -> Seq("v")))
    // overwrite drops every pre-rename set, so stale lineage would
    // only ever MISresolve — it must clear.
    GraftLake.overwrite(Seq((5L, "e", 50L)).toDF("k", "s", "v"), t)
    assert(GraftLake.renamesOf(t).isEmpty)
    val got = GraftLake.read(spark, t).collect().map(r =>
      (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((5L, 50L)))
    // and the returned 'v' is an ordinary column again: evolution works.
    GraftLake.append(Seq((6L, "f", 60L)).toDF("k", "s", "v"), t)
    assert(GraftLake.read(spark, t).count() == 2)
  }
}
