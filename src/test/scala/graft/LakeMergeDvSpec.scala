package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Merge-on-read MERGE (upsert) via deletion vectors: ONE atomic
  * `updatedv` commit carries a position sidecar masking the matched
  * target rows plus one appended set holding every update row — zero
  * bytes of the hit sets rewritten, O(update rows) write cost.
  * Lifecycle: zero-rewrite proof, pure-insert fast path, DV stacking
  * (runs atop outstanding sidecars, unlike copy-on-write merge),
  * Delta's cardinality rule, NULL-key refusal, exactly-once tags,
  * CDF images, CHECK constraints, compact materialization, and the
  * SQL MERGE route for DV-enabled tables.
  */
class LakeMergeDvSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-mgdv").resolve("t").toString

  private def dataFiles(path: String, sets: Set[String]): Set[String] = {
    import scala.jdk.CollectionConverters._
    sets.flatMap { set =>
      Files.list(java.nio.file.Paths.get(path, set)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet"))
    }
  }

  test("mergeDv rewrites zero bytes: one updatedv commit, sidecar + one appended set") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 50L).map(i => (i, i * 10)).toDF("id", "v"),
      path, Some("id"))
    GraftLake.append((51L to 100L).map(i => (i, i * 10)).toDF("id", "v"),
      path, Some("id"))
    val before = GraftLake.snapshot(path)
    val liveBefore = before.live.map(_.set).toSet
    val filesBefore = dataFiles(path, liveBefore)
    // 10 replacements (ids 41..60 step 2 exist) + 5 inserts (ids 101..105).
    val upd = ((41L to 59L by 2).map(i => (i, -i)) ++
      (101L to 105L).map(i => (i, i * 10))).toDF("id", "v")
    val (v, nm, ni) = GraftLake.mergeDv(spark, path, upd, Seq("id"), "id")
    assert(nm == 10L && ni == 5L)
    assert(v == before.version + 1)
    val after = GraftLake.snapshot(path)
    // Hit sets untouched BYTES: still live, same files, plus exactly
    // one appended data set and one position sidecar.
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.live.size == before.live.size + 1)
    assert(dataFiles(path, liveBefore) == filesBefore)
    assert(after.tombstones.size == 1)
    // Logical result: replaced rows carry the update's values once.
    val r = GraftLake.read(spark, path)
    assert(r.count() == 105)
    assert(r.filter(col("v") < 0).count() == 10)
    assert(r.agg(sum(col("v"))).head.getLong(0) ==
      (1L to 105L).map(_ * 10).sum - (41L to 59L by 2).map(i => i * 10 + i).sum)
    // Time travel to the pre-merge snapshot shows the old values.
    assert(GraftLake.readAt(spark, path, before.version).count() == 100)
    assert(GraftLake.readAt(spark, path, before.version)
      .filter(col("v") < 0).count() == 0)
  }

  test("pure-insert merge commits a plain append: no sidecar to drag through compact") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 20L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    val (v, nm, ni) = GraftLake.mergeDv(spark, path,
      (21L to 30L).map(i => (i, i)).toDF("id", "v"), Seq("id"), "id")
    assert(nm == 0L && ni == 10L)
    val s = GraftLake.snapshot(path)
    assert(s.version == v && s.tombstones.isEmpty)
    assert(GraftLake.commits(path).last.action == "append")
    assert(GraftLake.read(spark, path).count() == 30)
    // An empty update frame is a version-stable no-op.
    val (v2, nm2, ni2) = GraftLake.mergeDv(spark, path,
      Seq.empty[(Long, Long)].toDF("id", "v"), Seq("id"), "id")
    assert(v2 == v && nm2 == 0L && ni2 == 0L)
  }

  test("mergeDv stacks atop outstanding DVs and key tombstones — no inter-batch compact") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 40L).map(i => (i, 0L)).toDF("id", "v"), path, Some("id"))
    // Outstanding sidecars from prior MoR mutations...
    GraftLake.deleteDv(spark, path, col("id") > 35)
    GraftLake.updateDv(spark, path, col("id") <= 5, Seq("v" -> lit(1L)))
    assert(GraftLake.snapshot(path).tombstones.size == 2)
    // ...then an upsert batch: only VISIBLE rows match (deleted ids
    // 36..40 are gone, so their keys INSERT; updated ids replace the
    // post-image), and the copy-on-write merge would have refused here.
    val upd = (1L to 3L).map(i => (i, 100L)) ++ (36L to 37L).map(i => (i, 200L))
    val (_, nm, ni) = GraftLake.mergeDv(spark, path, upd.toDF("id", "v"),
      Seq("id"), "id")
    assert(nm == 3L && ni == 2L)
    val r = GraftLake.read(spark, path)
    assert(r.count() == 37)
    assert(r.filter(col("v") === 100).count() == 3)
    assert(r.filter(col("v") === 200).count() == 2)
    assert(r.filter(col("v") === 1).count() == 2) // ids 4,5 keep update #1
    // A second merge sees the FIRST merge's post-image as its input.
    val (_, nm2, _) = GraftLake.mergeDv(spark, path,
      Seq((1L, 300L)).toDF("id", "v"), Seq("id"), "id")
    assert(nm2 == 1L)
    assert(GraftLake.read(spark, path).filter(col("v") === 300).count() == 1)
    assert(GraftLake.read(spark, path).filter(col("v") === 100).count() == 2)
    // Compact drains every sidecar; values and count stable.
    val want = GraftLake.read(spark, path).agg(sum(col("v"))).head.getLong(0)
    GraftLake.compact(spark, path, Seq("id"), numFiles = 2, Some("id"))
    assert(GraftLake.snapshot(path).tombstones.isEmpty)
    assert(GraftLake.read(spark, path).count() == 37)
    assert(GraftLake.read(spark, path).agg(sum(col("v"))).head.getLong(0) == want)
  }

  test("cardinality rule: two source rows matching one target row refuse; dup inserts land") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    val before = GraftLake.snapshot(path)
    intercept[Exception] {
      GraftLake.mergeDv(spark, path,
        Seq((3L, 1L), (3L, 2L)).toDF("id", "v"), Seq("id"), "id")
    }
    val after = GraftLake.snapshot(path)
    assert(after.version == before.version && after.tombstones.isEmpty)
    // Duplicate keys among PURE INSERTS are not matched rows — they land.
    val (_, nm, ni) = GraftLake.mergeDv(spark, path,
      Seq((11L, 1L), (11L, 2L)).toDF("id", "v"), Seq("id"), "id")
    assert(nm == 0L && ni == 2L)
    assert(GraftLake.read(spark, path).filter(col("id") === 11).count() == 2)
  }

  test("NULL statsCol keys refuse loudly; unknown update columns refuse") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    intercept[Exception] {
      GraftLake.mergeDv(spark, path,
        Seq(Some(1L) -> 9L, (None: Option[Long]) -> 8L).toDF("id", "v"),
        Seq("id"), "id")
    }
    intercept[Exception] {
      GraftLake.mergeDv(spark, path,
        Seq((1L, 1L)).toDF("id", "nope"), Seq("id"), "id")
    }
  }

  test("exactly-once tag: a replayed epoch is a version-stable no-op") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, 0L)).toDF("id", "v"), path, Some("id"))
    val upd = Seq((1L, 7L), (11L, 7L)).toDF("id", "v")
    val (v1, nm1, ni1) = GraftLake.mergeDv(spark, path, upd, Seq("id"), "id",
      tag = Some("epoch-9"))
    assert(nm1 == 1L && ni1 == 1L)
    val (v2, nm2, ni2) = GraftLake.mergeDv(spark, path, upd, Seq("id"), "id",
      tag = Some("epoch-9"))
    assert(v2 == v1 && nm2 == 0L && ni2 == 0L)
    assert(GraftLake.read(spark, path).filter(col("v") === 7).count() == 2)
    // The pure-insert fast path threads the tag through its append too.
    val ins = Seq((20L, 1L)).toDF("id", "v")
    val (v3, _, _) = GraftLake.mergeDv(spark, path, ins, Seq("id"), "id",
      tag = Some("epoch-10"))
    val (v4, _, ni4) = GraftLake.mergeDv(spark, path, ins, Seq("id"), "id",
      tag = Some("epoch-10"))
    assert(v4 == v3 && ni4 == 0L)
    assert(GraftLake.read(spark, path).filter(col("id") === 20).count() == 1)
  }

  test("CDF stages update_preimage/update_postimage/insert for exactly the merge rows") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 20L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.enableCdf(path)
    val v0 = GraftLake.latestVersion(path)
    GraftLake.mergeDv(spark, path,
      ((1L to 5L).map(i => (i, i + 100)) ++ Seq((21L, 21L))).toDF("id", "v"),
      Seq("id"), "id")
    val feed = GraftLake.changesTyped(spark, path, v0)
    val pre = feed.filter(col("_change_type") === "update_preimage")
    val post = feed.filter(col("_change_type") === "update_postimage")
    val ins = feed.filter(col("_change_type") === "insert")
    assert(pre.count() == 5 && post.count() == 5 && ins.count() == 1)
    assert(pre.agg(sum(col("v"))).head.getLong(0) == (1L to 5L).sum)
    assert(post.agg(sum(col("v"))).head.getLong(0) == (1L to 5L).map(_ + 100).sum)
    assert(ins.head.getLong(0) == 21L)
  }

  test("CHECK constraints gate the update rows: a violating merge commits nothing") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.addConstraint(spark, path, "v_pos", "v >= 0")
    val before = GraftLake.snapshot(path)
    intercept[Exception] {
      GraftLake.mergeDv(spark, path, Seq((3L, -1L)).toDF("id", "v"),
        Seq("id"), "id")
    }
    val after = GraftLake.snapshot(path)
    assert(after.version == before.version && after.tombstones.isEmpty &&
      after.live.map(_.set).toSet == before.live.map(_.set).toSet)
  }

  test("SQL MERGE INTO routes onto mergeDv for DV-enabled tables: sidecar, not rewrite") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 30L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((31L to 60L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.enableDeletionVectors(path)
    graft.sources.LakeSql.register(spark, path, "mgdv_t", "id")
    val liveBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    ((25L to 34L).map(i => (i, -i)) ++ Seq((61L, 61L)))
      .toDF("id", "v").createOrReplaceTempView("mgdv_src")
    spark.sql(
      """MERGE INTO mgdv_t AS t USING mgdv_src AS s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = GraftLake.snapshot(path)
    // MoR route: hit sets survive by reference, one sidecar committed.
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.tombstones.size == 1)
    val r = GraftLake.read(spark, path)
    assert(r.count() == 61)
    assert(r.filter(col("v") < 0).count() == 10)
    // Without the opt-in the same MERGE takes the copy-on-write route.
    val path2 = freshTable()
    GraftLake.create((1L to 30L).map(i => (i, i)).toDF("id", "v"), path2, Some("id"))
    graft.sources.LakeSql.register(spark, path2, "mgcw_t", "id")
    spark.sql(
      """MERGE INTO mgcw_t AS t USING mgdv_src AS s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(GraftLake.snapshot(path2).tombstones.isEmpty)
    assert(GraftLake.read(spark, path2).count() == 35)
  }

  test("span pruning: only statsCol-overlapping sets are searched for positions") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((101L to 200L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((201L to 300L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    val (_, nm, ni) = GraftLake.mergeDv(spark, path,
      (150L to 160L).map(i => (i, -i)).toDF("id", "v"), Seq("id"), "id")
    assert(nm == 11L && ni == 0L)
    // The position search opened ONE of the three sets.
    assert(GraftLake.lastDvScanSets == (1, 2))
    assert(GraftLake.read(spark, path).filter(col("v") < 0).count() == 11)
  }
}
