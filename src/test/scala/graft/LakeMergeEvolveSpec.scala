package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** MERGE schema auto-evolution (Delta's schema.autoMerge): source
  * columns missing from the target are added as nullable columns via
  * one zero-data `evolve` commit before the upsert lands — on both
  * the copy-on-write and deletion-vector merge routes, API and SQL
  * (TBLPROPERTIES 'schemaAutoMerge'). Off by default: unknown
  * columns keep refusing.
  */
class LakeMergeEvolveSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-mevo").resolve("t").toString

  test("merge autoEvolve adds the new column once, null-fills old rows") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i * 10)).toDF("id", "v"),
      path, Some("id"))
    val src = Seq((3L, 999L, 7L), (11L, 110L, 8L)).toDF("id", "v", "score")
    // Off by default: unknown columns refuse.
    intercept[Exception] {
      GraftLake.merge(spark, path, src, Seq("id"), "id")
    }
    val (_, _, _) = GraftLake.merge(spark, path, src, Seq("id"), "id",
      autoEvolve = true)
    val r = GraftLake.read(spark, path)
    assert(r.columns.toSeq == Seq("id", "v", "score"))
    assert(r.count() == 11)
    assert(r.filter(col("id") === 3).head.getLong(2) == 7L)
    assert(r.filter(col("id") === 11).head.getLong(2) == 8L)
    assert(r.filter(col("score").isNull).count() == 9)
    // Exactly one evolve commit; a replay with the same shape adds none.
    def evolves: Int = GraftLake.commits(path).count(_.action == "evolve")
    assert(evolves == 1)
    GraftLake.merge(spark, path, src, Seq("id"), "id", autoEvolve = true)
    assert(evolves == 1)
  }

  test("mergeDv autoEvolve keeps the zero-rewrite posture") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 20L).map(i => (i, i)).toDF("id", "v"),
      path, Some("id"))
    val liveBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    val src = Seq((5L, -5L, "x"), (21L, 21L, "y")).toDF("id", "v", "tagc")
    intercept[Exception] {
      GraftLake.mergeDv(spark, path, src, Seq("id"), "id")
    }
    val (_, nm, ni) = GraftLake.mergeDv(spark, path, src, Seq("id"), "id",
      autoEvolve = true)
    assert(nm == 1L && ni == 1L)
    val after = GraftLake.snapshot(path)
    // The evolve commit is zero-data; the merge adds sidecar + one set.
    assert(liveBefore.subsetOf(after.live.map(_.set).toSet))
    assert(after.live.size == liveBefore.size + 1)
    assert(after.tombstones.size == 1)
    val r = GraftLake.read(spark, path)
    assert(r.filter(col("tagc") === "x").count() == 1)
    assert(r.filter(col("tagc").isNull).count() == 19)
    GraftLake.compact(spark, path, Seq("id"), numFiles = 2, Some("id"))
    assert(GraftLake.read(spark, path).filter(col("tagc") === "y").count() == 1)
  }

  test("SQL MERGE evolves under TBLPROPERTIES schemaAutoMerge; 'false' restores refusal") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"),
      path, Some("id"))
    LakeSql.register(spark, path, "mevo_t", "id")
    Seq((2L, 22L, 5L), (12L, 120L, 6L)).toDF("id", "v", "extra")
      .createOrReplaceTempView("mevo_src")
    val mergeSql =
      """MERGE INTO mevo_t t USING mevo_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    intercept[Exception] { spark.sql(mergeSql) }
    spark.sql(
      "ALTER TABLE mevo_t SET TBLPROPERTIES ('schemaAutoMerge'='true')")
    spark.sql(mergeSql)
    val r = GraftLake.read(spark, path)
    assert(r.columns.toSeq == Seq("id", "v", "extra"))
    assert(r.count() == 11)
    assert(r.filter(col("extra").isNotNull).count() == 2)
    // The flag is a route toggle: un-setting restores the refusal for
    // a source with yet another new column.
    spark.sql(
      "ALTER TABLE mevo_t SET TBLPROPERTIES ('schemaAutoMerge'='false')")
    // (Canonical shape — a matched-only star MERGE routes to
    // mergeActions, where extra source columns are legal expression
    // inputs and never evolve the schema.)
    Seq((3L, 33L, 0L, 1L)).toDF("id", "v", "extra", "more")
      .createOrReplaceTempView("mevo_src2")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO mevo_t t USING mevo_src2 s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(GraftLake.read(spark, path).columns.length == 3)
  }
}
