package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** Column-list CREATE TABLE (empty create) + TRUNCATE TABLE:
  * the zero-data create commit, the O(1) by-reference truncate, and
  * their SQL routes.
  */
class LakeCreateTruncateSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-createempty").resolve("t").toString

  test("createEmpty commits a zero-data v0; reads empty, inserts land") {
    import spark.implicits._
    val p = fresh()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, tag STRING, v BIGINT")
    GraftLake.createEmpty(p, schema)
    assert(GraftLake.latestVersion(p) == 0)
    assert(GraftLake.snapshot(p).live.isEmpty)
    val r0 = GraftLake.read(spark, p)
    assert(r0.count() == 0 && r0.schema.fieldNames.toSeq ==
      Seq("id", "tag", "v"))
    GraftLake.append(Seq((1L, "a", 10L)).toDF("id", "tag", "v"), p,
      statsCol = Some("id"))
    assert(GraftLake.read(spark, p).count() == 1)
  }

  test("SQL column-list CREATE TABLE: empty create + INSERT + DDL compose") {
    val p = fresh()
    spark.sql(s"""CREATE TABLE ct_empty (id BIGINT, tag STRING, v BIGINT)
                 |USING graftlake LOCATION '$p'
                 |TBLPROPERTIES ('statscol'='id')""".stripMargin)
    assert(spark.sql("SELECT * FROM ct_empty").count() == 0)
    spark.sql("INSERT INTO ct_empty VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql("INSERT INTO ct_empty (id, tag) VALUES (3, 'c')")
    val rows = spark.sql(
      "SELECT id, tag, v FROM ct_empty ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(2).isNullAt(2)) // unnamed column null-fills
    // stats recorded for the registered statscol on the insert commits
    assert(GraftLake.commits(p).filter(_.action == "append")
      .forall(_.stats.exists(_.col == "id")))
    // IDENTITY clause records the (start, step) coldef and enables
    // row tracking (the full surface is LakeIdentitySpec + src52)
    val q = fresh()
    spark.sql(s"""CREATE TABLE ct_def
                 |(id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT)
                 |USING graftlake LOCATION '$q'""".stripMargin)
    assert(GraftLake.identityColumnsOf(q) == Map("id" -> (1L, 1L)))
    assert(GraftLake.rowTrackingEnabled(q))
    LakeSql.unregister("ct_def")
    LakeSql.unregister("ct_empty")
  }

  test("SQL empty create PARTITIONED BY seeds the layout before first insert") {
    val p = fresh()
    spark.sql(s"""CREATE TABLE ct_part (id BIGINT, yr INT)
                 |USING graftlake LOCATION '$p'
                 |TBLPROPERTIES ('statscol'='id')
                 |PARTITIONED BY (yr)""".stripMargin)
    assert(GraftLake.partitionColumnOf(p).contains("yr"))
    spark.sql("INSERT INTO ct_part VALUES (1, 1995), (2, 1996), (3, 1995)")
    // one set per partition value, exact min==max manifests
    val sets = GraftLake.snapshot(p).live
    assert(sets.size == 2)
    assert(sets.forall(ls => ls.statsFor("yr").exists(s => s.min == s.max)))
    // non-integral partition column refuses
    val q = fresh()
    val err = intercept[Exception] {
      spark.sql(s"""CREATE TABLE ct_badpart (id BIGINT, tag STRING)
                   |USING graftlake LOCATION '$q'
                   |PARTITIONED BY (tag)""".stripMargin)
    }
    assert(err.getMessage.contains("integral"))
    LakeSql.unregister("ct_part")
  }

  test("truncate drops all sets by reference in one commit; schema survives") {
    import spark.implicits._
    val p = fresh()
    val df = (1L to 30L).map(i => (i, i * 2)).toDF("id", "v")
    GraftLake.create(df, p, Some("id"))
    GraftLake.append(df.filter(col("id") <= 5), p, statsCol = Some("id"))
    val before = GraftLake.snapshot(p)
    assert(before.live.size == 2)
    val v = GraftLake.truncate(p)
    val after = GraftLake.snapshot(p)
    assert(v == before.version + 1 && after.version == v)
    assert(after.live.isEmpty && after.tombstones.isEmpty)
    assert(after.schemaDdl == before.schemaDdl)
    // zero rewrite: no new data sets staged, old bytes still on disk
    // (time travel reads them until vacuum)
    assert(GraftLake.commits(p).last.add.isEmpty)
    assert(GraftLake.readAt(spark, p, before.version).count() == 35)
    assert(GraftLake.read(spark, p).count() == 0)
    // insert after truncate works; truncate of an empty table no-ops
    GraftLake.append(df.limit(3), p, statsCol = Some("id"))
    assert(GraftLake.read(spark, p).count() == 3)
    GraftLake.truncate(p)
    assert(GraftLake.truncate(p) == GraftLake.latestVersion(p)) // no-op
  }

  test("SQL TRUNCATE TABLE routes to the lake; CDF feeds serve the deletes") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create((1L to 9L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    LakeSql.register(spark, p, "ct_trunc", "id")
    spark.sql("TRUNCATE TABLE ct_trunc")
    assert(spark.sql("SELECT * FROM ct_trunc").count() == 0)
    assert(GraftLake.commits(p).last.action == "truncate")
    // CDF tables truncate by reference too: the feed reads the
    // REMOVED sets as delete images at read time — zero staged bytes
    val q = fresh()
    GraftLake.create((1L to 4L).map(i => (i, i)).toDF("id", "v"), q, Some("id"))
    GraftLake.enableCdf(q)
    val vT = GraftLake.truncate(q)
    val feed = GraftLake.changesTyped(spark, q, vT - 1)
    assert(feed.count() == 4)
    assert(feed.filter(col("_change_type") === "delete").count() == 4)
    // outstanding MoR masks still refuse (images would diverge)
    val r = fresh()
    GraftLake.create((1L to 6L).map(i => (i, i)).toDF("id", "v"), r, Some("id"))
    GraftLake.enableCdf(r)
    GraftLake.deleteDv(spark, r, expr("id = 2"))
    val err = intercept[Exception] { GraftLake.truncate(r) }
    assert(err.getMessage.contains("OPTIMIZE"))
    LakeSql.unregister("ct_trunc")
  }

  test("truncate survives checkpoint + restore round-trips") {
    import spark.implicits._
    val p = fresh()
    val df = (1L to 20L).map(i => (i, i)).toDF("id", "v")
    GraftLake.create(df, p, Some("id"))
    val vFull = GraftLake.latestVersion(p)
    GraftLake.truncate(p)
    GraftLake.checkpoint(p)
    assert(GraftLake.snapshot(p).live.isEmpty)
    // restore back to the pre-truncate version: rows return
    GraftLake.restore(spark, p, vFull)
    assert(GraftLake.read(spark, p).count() == 20)
  }
}
