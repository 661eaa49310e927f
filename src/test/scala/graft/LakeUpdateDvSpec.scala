package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Merge-on-read UPDATE via deletion vectors: one atomic `updatedv`
  * commit carries the position sidecar (masking the old row images)
  * plus the appended rewritten rows — zero bytes of the hit sets
  * rewritten. Lifecycle: swap semantics, time travel, append-after,
  * DV stacking, compact materialization, CDF images, constraint
  * refusal, and the SQL route for DV-enabled tables.
  */
class LakeUpdateDvSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-updv").resolve("t").toString

  private def dataFiles(path: String, sets: Set[String]): Set[String] = {
    import scala.jdk.CollectionConverters._
    sets.flatMap { set =>
      Files.list(java.nio.file.Paths.get(path, set)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet"))
    }
  }

  test("updateDv rewrites zero bytes of the hit sets: one commit, sidecar + appended rows") {
    import spark.implicits._
    val path = freshTable()
    val df1 = (1L to 50L).map(i => (i, i % 5, i * 10)).toDF("id", "m", "v")
    val df2 = (51L to 100L).map(i => (i, i % 5, i * 10)).toDF("id", "m", "v")
    GraftLake.create(df1, path, Some("id"))
    GraftLake.append(df2, path, Some("id"))
    val before = GraftLake.snapshot(path)
    val liveBefore = before.live.map(_.set).toSet
    val filesBefore = dataFiles(path, liveBefore)
    val (v, n) = GraftLake.updateDv(spark, path,
      col("m") === 2, Seq("v" -> (col("v") + 1)), Some("id"))
    assert(n == 20L)
    // ONE commit: version advanced exactly once, action = updatedv.
    assert(v == before.version + 1)
    val after = GraftLake.snapshot(path)
    assert(after.version == v)
    // The original sets are untouched BYTES — still live, same files —
    // plus exactly one appended data set and one DV sidecar.
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.live.size == before.live.size + 1)
    assert(dataFiles(path, liveBefore) == filesBefore)
    assert(after.tombstones.size == 1)
    // Logical result: updated rows once, total count stable.
    assert(GraftLake.read(spark, path).count() == 100)
    val got = GraftLake.read(spark, path).filter(col("m") === 2)
      .agg(sum(col("v"))).head.getLong(0)
    val want = (1L to 100L).filter(_ % 5 == 2).map(_ * 10 + 1).sum
    assert(got == want)
    // Time travel to pre-update shows the old values.
    val old = GraftLake.readAt(spark, path, before.version)
      .filter(col("m") === 2).agg(sum(col("v"))).head.getLong(0)
    assert(old == (1L to 100L).filter(_ % 5 == 2).map(_ * 10).sum)
  }

  test("assignments read the input row: SET a = b, b = a swaps; NULL condition updates nothing") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i, i * 100)).toDF("id", "a", "b"), path)
    GraftLake.updateDv(spark, path, col("id") <= 3,
      Seq("a" -> col("b"), "b" -> col("a")))
    val r = GraftLake.read(spark, path).filter(col("id") === 2).head
    assert(r.getLong(1) == 200L && r.getLong(2) == 2L)
    // A NULL-evaluating predicate is not-satisfied (SQL semantics).
    val (_, n) = GraftLake.updateDv(spark, path,
      when(col("id") < 5, lit(null).cast("boolean")).otherwise(lit(false)),
      Seq("a" -> lit(-1L)))
    assert(n == 0L)
    // Unknown target / duplicate targets refuse.
    intercept[Exception] {
      GraftLake.updateDv(spark, path, lit(true), Seq("nope" -> lit(1L)))
    }
    intercept[Exception] {
      GraftLake.updateDv(spark, path, lit(true),
        Seq("a" -> lit(1L), "a" -> lit(2L)))
    }
  }

  test("position identity: rows appended after the update are not re-matched; DVs stack") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 30L).map(i => (i, i % 3, 0L)).toDF("id", "m", "v"), path)
    GraftLake.updateDv(spark, path, col("m") === 1, Seq("v" -> lit(7L)))
    // Appended rows satisfying the predicate keep their own values —
    // the committed DV masks only the positions it was built against.
    GraftLake.append((31L to 40L).map(i => (i, 1L, 100L)).toDF("id", "m", "v"), path)
    val appended = GraftLake.read(spark, path).filter(col("id") > 30)
    assert(appended.count() == 10 &&
      appended.filter(col("v") === 100).count() == 10)
    // A second updateDv stacks on the first (two sidecars outstanding)
    // and sees the FIRST update's post-image rows as its input.
    GraftLake.updateDv(spark, path, col("v") === 7, Seq("v" -> lit(8L)))
    assert(GraftLake.snapshot(path).tombstones.size == 2)
    assert(GraftLake.read(spark, path).filter(col("v") === 8).count() == 10)
    // And a deleteDv composes with both.
    GraftLake.deleteDv(spark, path, col("v") === 8)
    assert(GraftLake.read(spark, path).count() == 30)
    assert(GraftLake.read(spark, path).filter(col("v") === 8).count() == 0)
  }

  test("compact materializes: sidecars cleared, values preserved, count stable") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 60L).map(i => (i, i % 4, i)).toDF("id", "m", "v"), path,
      Some("id"))
    GraftLake.updateDv(spark, path, col("m") === 0, Seq("v" -> (col("v") * 2)))
    val wantSum = GraftLake.read(spark, path).agg(sum(col("v"))).head.getLong(0)
    GraftLake.compact(spark, path, Seq("id"), numFiles = 2, Some("id"))
    assert(GraftLake.snapshot(path).tombstones.isEmpty)
    assert(GraftLake.read(spark, path).count() == 60)
    assert(GraftLake.read(spark, path).agg(sum(col("v"))).head.getLong(0) == wantSum)
  }

  test("CDF stages update_preimage + update_postimage for exactly the hit rows") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 20L).map(i => (i, i)).toDF("id", "v"), path)
    GraftLake.enableCdf(path)
    val v0 = GraftLake.latestVersion(path)
    GraftLake.updateDv(spark, path, col("id") <= 5, Seq("v" -> (col("v") + 100)))
    val feed = GraftLake.changesTyped(spark, path, v0)
    val pre = feed.filter(col("_change_type") === "update_preimage")
    val post = feed.filter(col("_change_type") === "update_postimage")
    assert(pre.count() == 5 && post.count() == 5)
    assert(pre.agg(sum(col("v"))).head.getLong(0) == (1L to 5L).sum)
    assert(post.agg(sum(col("v"))).head.getLong(0) == (1L to 5L).map(_ + 100).sum)
  }

  test("CHECK constraints gate the rewritten rows: a violating update commits nothing") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), path)
    GraftLake.addConstraint(spark, path, "v_pos", "v >= 0")
    val before = GraftLake.snapshot(path)
    intercept[Exception] {
      GraftLake.updateDv(spark, path, col("id") <= 3, Seq("v" -> lit(-5L)))
    }
    val after = GraftLake.snapshot(path)
    assert(after.version == before.version &&
      after.tombstones.isEmpty &&
      after.live.map(_.set).toSet == before.live.map(_.set).toSet)
    assert(GraftLake.read(spark, path).filter(col("v") < 0).count() == 0)
  }

  test("DV mutations prune provably-disjoint sets off the manifest") {
    import spark.implicits._
    val path = freshTable()
    // Three sets with DISJOINT id spans, recorded as zone maps.
    GraftLake.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((101L to 200L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((201L to 300L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    // A middle-span predicate opens ONE set (conjuncts compose; the
    // extra always-true leg on a non-stats shape adds no constraint).
    val (_, n) = GraftLake.updateDv(spark, path,
      col("id") >= 120 && col("id") <= 180 && col("v") % 2 === 0,
      Seq("v" -> (col("v") + 1000)), Some("id"))
    assert(n == 31L)
    assert(GraftLake.lastDvScanSets == (1, 2))
    // Equality and IN prune the same way on deleteDv (the update's
    // appended set carries its own id span, so it prunes too).
    GraftLake.deleteDv(spark, path, col("id") === 250)
    assert(GraftLake.lastDvScanSets == (1, 3))
    GraftLake.deleteDv(spark, path, col("id").isin(10, 20, 30))
    assert(GraftLake.lastDvScanSets == (1, 3))
    // An OR predicate yields no constraint — conservative full scan.
    GraftLake.deleteDv(spark, path, col("id") === 5 || col("v") === -1)
    assert(GraftLake.lastDvScanSets == (4, 0))
    // Pruning never changed the answer.
    assert(GraftLake.read(spark, path).count() == 300 - 1 - 3 - 1)
    assert(GraftLake.read(spark, path).filter(col("v") > 1000).count() == 31)
    // SQL DELETE on a DV-opted table prunes through the same
    // extraction (the expr-parsed predicate carries the conjuncts).
    GraftLake.enableDeletionVectors(path)
    graft.sources.LakeSql.register(spark, path, "updv_prune", "id")
    spark.sql("DELETE FROM updv_prune WHERE id <= 50")
    assert(GraftLake.lastDvScanSets == (1, 3))
  }

  test("equality predicates prune by Bloom sidecars when zone maps cannot") {
    import spark.implicits._
    val path = freshTable()
    // Mod-split layout: every set spans the FULL id range, so zone
    // maps never prune — the bloom sidecar is the only skip signal.
    GraftLake.create((1L to 300L).filter(_ % 3 == 0).map(i => (i, i))
      .toDF("id", "v"), path, bloomCols = Seq("id"))
    (1 to 2).foreach(m => GraftLake.append(
      (1L to 300L).filter(_ % 3 == m).map(i => (i, i)).toDF("id", "v"),
      path, bloomCols = Seq("id")))
    // Point DV delete: only the bloom-positive set(s) scan.
    GraftLake.deleteDv(spark, path, col("id") === 42)
    assert(GraftLake.lastDvScanSets._2 >= 1,
      s"bloom never pruned: ${GraftLake.lastDvScanSets}")
    assert(GraftLake.read(spark, path).count() == 299)
    // MoR update through the same signal.
    GraftLake.updateDv(spark, path, col("id") === 100, Seq("v" -> lit(-1L)))
    assert(GraftLake.lastDvScanSets._2 >= 1)
    assert(GraftLake.read(spark, path).filter(col("v") === -1).count() == 1)
    // CoW update: IN-list values map to two of three sets.
    GraftLake.compact(spark, path, Seq("id"), numFiles = 1)
    GraftLake.create((1L to 300L).filter(_ % 3 == 0).map(i => (i, i))
      .toDF("id", "v"), path + "2", bloomCols = Seq("id"))
    (1 to 2).foreach(m => GraftLake.append(
      (1L to 300L).filter(_ % 3 == m).map(i => (i, i)).toDF("id", "v"),
      path + "2", bloomCols = Seq("id")))
    GraftLake.update(spark, path + "2", col("id").isin(10, 20),
      Seq("v" -> lit(0L)))
    assert(GraftLake.lastCowScanSets._2 >= 1,
      s"bloom never pruned the CoW path: ${GraftLake.lastCowScanSets}")
    assert(GraftLake.read(spark, path + "2")
      .filter(col("v") === 0).count() == 2)
  }

  test("copy-on-write delete/update prune by the same predicate-implied ranges") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((101L to 200L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    GraftLake.append((201L to 300L).map(i => (i, i)).toDF("id", "v"), path, Some("id"))
    val (_, rw, kept, nDel) = GraftLake.delete(spark, path,
      col("id") > 250 && col("id") < 261, Some("id"))
    assert(nDel == 10L && rw == 1 && kept == 2)
    assert(GraftLake.lastCowScanSets == (1, 2))
    val (_, rw2, kept2, nUpd) = GraftLake.update(spark, path,
      col("id") === 150, Seq("v" -> lit(0L)), Some("id"))
    assert(nUpd == 1L && rw2 == 1 && kept2 == 2)
    assert(GraftLake.lastCowScanSets == (1, 2))
    // No extractable constraint — conservative scan of every set.
    GraftLake.update(spark, path, col("v") === 42, Seq("v" -> lit(43L)), Some("id"))
    assert(GraftLake.lastCowScanSets._2 == 0)
    assert(GraftLake.read(spark, path).count() == 290)
  }

  test("SQL UPDATE routes onto updateDv for DV-enabled tables: zero rewrite") {
    import spark.implicits._
    val path = freshTable()
    (1L to 40L).map(i => (i, i % 2, i)).toDF("id", "m", "v")
      .createOrReplaceTempView("updv_src")
    spark.sql(s"""CREATE TABLE updv_sql USING graftlake LOCATION '$path'
                 |TBLPROPERTIES ('statscol'='id')
                 |AS SELECT * FROM updv_src""".stripMargin)
    GraftLake.enableDeletionVectors(path)
    val liveBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    spark.sql("UPDATE updv_sql SET v = v + 1000 WHERE m = 1")
    val after = GraftLake.snapshot(path)
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.tombstones.size == 1)
    assert(GraftLake.read(spark, path).filter(col("v") > 1000).count() == 20)
    assert(GraftLake.read(spark, path).count() == 40)
    // OPTIMIZE materializes the sidecar.
    spark.sql("OPTIMIZE updv_sql")
    assert(GraftLake.snapshot(path).tombstones.isEmpty)
    assert(GraftLake.read(spark, path).filter(col("v") > 1000).count() == 20)
  }
}
