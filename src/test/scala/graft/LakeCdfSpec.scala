package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Row-level CHANGE DATA FEED: merge/delete/deleteMoR commits stage
  * typed change sidecars; changesTyped serves them with inserts from
  * append commits. The Delta-CDF shape for this format.
  */
class LakeCdfSpec extends AnyFunSuite with SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "s", "v")
  }

  private def typed(df: DataFrame): Set[(Long, String, Long, String, Int)] =
    df.collect().map(r => (
      r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("s")),
      r.getLong(r.fieldIndex("v")), r.getString(r.fieldIndex("_change_type")),
      r.getInt(r.fieldIndex("_commit_version")))).toSet

  test("merge emits preimage/postimage/insert; deletes emit delete rows") {
    import spark.implicits._
    val t = tmp("cdf-merge")
    GraftLake.create(base, t, Some("k"))
    GraftLake.enableCdf(t)
    // v1 merge: k=2 updates (v 20->99), k=9 inserts.
    GraftLake.merge(spark, t,
      Seq((2L, "b", 99L), (9L, "i", 90L)).toDF("k", "s", "v"), Seq("k"), "k")
    // v2 copy-on-write delete: k=3.
    GraftLake.delete(spark, t, col("k") === 3L, Some("k"))
    // v3 merge-on-read delete: k=4.
    GraftLake.deleteMoR(spark, t, col("k") === 4L, "k")
    val got = typed(GraftLake.changesTyped(spark, t, 0))
    assert(got == Set(
      (2L, "b", 20L, "update_preimage", 1),
      (2L, "b", 99L, "update_postimage", 1),
      (9L, "i", 90L, "insert", 1),
      (3L, "c", 30L, "delete", 2),
      (4L, "d", 40L, "delete", 3)))
    // From -1 the create rows join as version-0 inserts.
    val all = typed(GraftLake.changesTyped(spark, t, -1))
    assert(all.size == got.size + 4 &&
      all.filter(_._5 == 0).forall(_._4 == "insert"))
    // Determinism: a second read returns the identical feed.
    assert(typed(GraftLake.changesTyped(spark, t, 0)) == got)
  }

  test("a mirror applying the typed feed equals the table read") {
    import spark.implicits._
    val t = tmp("cdf-mirror")
    GraftLake.create(base, t, Some("k"))
    GraftLake.enableCdf(t)
    GraftLake.append(Seq((5L, "e", 50L), (6L, "f", 60L)).toDF("k", "s", "v"), t)
    GraftLake.merge(spark, t,
      Seq((1L, "a", 111L), (7L, "g", 70L)).toDF("k", "s", "v"), Seq("k"), "k")
    GraftLake.delete(spark, t, col("k") % 2 === 0, Some("k"))
    GraftLake.deleteMoR(spark, t, col("k") === 7L, "k")
    val seed = GraftLake.readAt(spark, t, 0)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(0))
    val feed = seed.unionByName(GraftLake.changesTyped(spark, t, 0))
      .withColumn("_pri",
        when(col("_change_type") === "update_preimage", 0).otherwise(1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"))
      .orderBy(col("_commit_version").desc, col("_pri").desc)
    val mirror = feed
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .filter(col("_change_type") =!= "delete")
      .select(col("k"), col("s"), col("v"))
    val table = GraftLake.read(spark, t)
    assert(mirror.exceptAll(table).count() == 0 &&
      table.exceptAll(mirror).count() == 0)
    assert(table.count() == 3) // k=1 (updated), k=3, k=5 survive
  }

  test("mutations without CDF enabled fail the typed read loudly") {
    import spark.implicits._
    val t = tmp("cdf-off")
    GraftLake.create(base, t, Some("k"))
    GraftLake.delete(spark, t, col("k") === 1L, Some("k")) // no sidecar
    val e = intercept[IllegalStateException] {
      GraftLake.changesTyped(spark, t, 0).collect()
    }
    assert(e.getMessage.contains("no change-data sidecar"))
    // Not retroactive: enabling NOW does not heal the old commit.
    GraftLake.enableCdf(t)
    intercept[IllegalStateException] {
      GraftLake.changesTyped(spark, t, 0).collect()
    }
    // But later mutations feed fine when read from after the gap.
    GraftLake.delete(spark, t, col("k") === 2L, Some("k"))
    val got = typed(GraftLake.changesTyped(spark, t, 1))
    assert(got == Set((2L, "b", 20L, "delete", 2)))
  }

  test("compact emits no changes; overwrite rejects the feed") {
    import spark.implicits._
    val t = tmp("cdf-compact")
    GraftLake.create(base, t, Some("k"))
    GraftLake.enableCdf(t)
    GraftLake.deleteMoR(spark, t, col("k") === 1L, "k")
    GraftLake.compact(spark, t, Seq("k"), 1)
    // The tombstone's delete row is the ONLY change; compaction is
    // physical re-layout and adds nothing.
    val got = typed(GraftLake.changesTyped(spark, t, 0))
    assert(got == Set((1L, "a", 10L, "delete", 1)))
    GraftLake.overwrite(Seq((8L, "h", 80L)).toDF("k", "s", "v"), t)
    val e = intercept[IllegalStateException] {
      GraftLake.changesTyped(spark, t, 0).collect()
    }
    assert(e.getMessage.contains("not representable"))
    // A consumer re-seeds past the overwrite and keeps feeding.
    GraftLake.append(Seq((9L, "i", 90L)).toDF("k", "s", "v"), t)
    val after = typed(GraftLake.changesTyped(spark, t, 3))
    assert(after == Set((9L, "i", 90L, "insert", 4)))
  }

  test("restore emits the row-level diff through the feed; refusals are loud") {
    import spark.implicits._
    val t = tmp("cdf-restore")
    GraftLake.create(base, t, Some("k"))                            // v0
    GraftLake.enableCdf(t)
    GraftLake.update(spark, t, col("k") === 2L,
      Seq("v" -> lit(99L)), Some("k"))                              // v1
    GraftLake.delete(spark, t, col("k") === 3L, Some("k"))          // v2
    val rv = GraftLake.restore(spark, t, 0)                        // v3
    assert(rv == 3)
    // The rollback's CDF diff: the updated row reverts (delete new
    // image, insert old), the deleted row returns (insert).
    val got = typed(GraftLake.changesTyped(spark, t, 2))
    assert(got == Set(
      (2L, "b", 99L, "delete", 3),
      (2L, "b", 20L, "insert", 3),
      (3L, "c", 30L, "insert", 3)))
    // And the table reads exactly v0 again.
    assert(GraftLake.read(spark, t).collect().map(r =>
      (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // Refusals: vacuumed history, outstanding tombstones.
    GraftLake.vacuum(t) // reclaims the pre-restore rewrite sets
    val e = intercept[IllegalArgumentException] {
      GraftLake.restore(spark, t, 1)
    }
    assert(e.getMessage.contains("vacuumed"))
    GraftLake.deleteMoR(spark, t, col("k") === 1L, "k")
    intercept[IllegalArgumentException] { GraftLake.restore(spark, t, 0) }
  }

  test("replaceWhere feeds delete+insert images and drops inside sets by reference") {
    import spark.implicits._
    val t = tmp("cdf-rw")
    val df = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 30L), (4L, 2L, 40L))
      .toDF("k", "p", "v")
    GraftLake.appendPartitioned(df, t, "p")                       // v0: 2 sets
    GraftLake.enableCdf(t)
    val (_, rew, kept, n) = GraftLake.replaceWhere(spark, t,
      Seq((9L, 1L, 90L)).toDF("k", "p", "v"), "p", 1L, 1L)       // v1
    assert(rew == 1 && kept == 1 && n == 2L)
    val got = typed2(GraftLake.changesTyped(spark, t, 0))
    assert(got == Set(
      (1L, 1L, 10L, "delete", 1), (2L, 1L, 20L, "delete", 1),
      (9L, 1L, 90L, "insert", 1)))
    assert(GraftLake.read(spark, t).count() == 3)
  }

  private def typed2(df: DataFrame): Set[(Long, Long, Long, String, Int)] =
    df.collect().map(r => (
      r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("p")),
      r.getLong(r.fieldIndex("v")), r.getString(r.fieldIndex("_change_type")),
      r.getInt(r.fieldIndex("_commit_version")))).toSet

  test("vacuum reclaims cdf sidecars outside retention; the feed then refuses loudly") {
    import spark.implicits._
    val t = tmp("cdf-retention")
    GraftLake.create(base, t, Some("k"))                             // v0
    GraftLake.enableCdf(t)
    GraftLake.merge(spark, t, Seq((1L, "a", 11L)).toDF("k", "s", "v"),
      Seq("k"), "k")                                                 // v1
    GraftLake.merge(spark, t, Seq((2L, "b", 22L)).toDF("k", "s", "v"),
      Seq("k"), "k")                                                 // v2
    // Zero retention: v1's sidecar is outside the window and is
    // reclaimed (log-addressable via the commit's cdf field); HEAD's
    // (v2) survives.
    val reclaimed = GraftLake.vacuum(t)
    assert(reclaimed.exists(_.startsWith("cdf/")),
      s"no cdf sidecar reclaimed: $reclaimed")
    // Serving the reclaimed range refuses loudly, the retained range
    // still serves.
    val e = intercept[IllegalArgumentException] {
      GraftLake.changesTyped(spark, t, 0).collect()
    }
    assert(e.getMessage.contains("vacuumed"))
    val got = typed(GraftLake.changesTyped(spark, t, 1))
    assert(got == Set(
      (2L, "b", 20L, "update_preimage", 2),
      (2L, "b", 22L, "update_postimage", 2)))
    // A wide retention window reclaims nothing further.
    assert(!GraftLake.vacuum(t, retainMillis = 3600L * 1000)
      .exists(_.startsWith("cdf/")))
  }

  test("cdf sidecars survive vacuum and never join the live sets") {
    import spark.implicits._
    val t = tmp("cdf-vacuum")
    GraftLake.create(base, t, Some("k"))
    GraftLake.enableCdf(t)
    GraftLake.merge(spark, t, Seq((1L, "a", 99L)).toDF("k", "s", "v"),
      Seq("k"), "k")
    val reclaimed = GraftLake.vacuum(t)
    assert(reclaimed.nonEmpty) // the merge's victim data set
    assert(reclaimed.forall(_.startsWith("data/")))
    // The sidecar still serves after vacuum.
    val got = typed(GraftLake.changesTyped(spark, t, 0))
    assert(got == Set(
      (1L, "a", 10L, "update_preimage", 1),
      (1L, "a", 99L, "update_postimage", 1)))
  }
}
