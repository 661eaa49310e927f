package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** Column DEFAULT and GENERATED expressions: sealed `coldef` log
  * entries the INSERT/COPY routes consult — omitted defaulted columns
  * fill, generated columns always compute, explicit writes to
  * generated columns refuse; metadata rides checkpoints and clones.
  */
class LakeColDefsSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-coldefs").resolve("t").toString

  test("SQL CREATE with DEFAULT and GENERATED; INSERT fills and computes") {
    val p = fresh()
    spark.sql(s"""CREATE TABLE cd_t (
                 |  id BIGINT,
                 |  qty BIGINT DEFAULT 1,
                 |  region STRING DEFAULT 'emea',
                 |  total BIGINT GENERATED ALWAYS AS (id * 100 + qty))
                 |USING graftlake LOCATION '$p'
                 |TBLPROPERTIES ('statscol'='id')""".stripMargin)
    assert(GraftLake.columnDefaultsOf(p).keySet == Set("qty", "region"))
    assert(GraftLake.generatedColumnsOf(p).keySet == Set("total"))
    // positional insert: all NON-GENERATED columns, generated computes
    spark.sql("INSERT INTO cd_t VALUES (1, 5, 'apac')")
    // named insert omitting defaulted columns: defaults fill
    spark.sql("INSERT INTO cd_t (id) VALUES (2)")
    val rows = spark.sql(
      "SELECT id, qty, region, total FROM cd_t ORDER BY id").collect()
    assert(rows(0).toSeq == Seq(1L, 5L, "apac", 105L))
    assert(rows(1).toSeq == Seq(2L, 1L, "emea", 201L))
    // explicitly naming the generated column refuses
    val err = intercept[Exception] {
      spark.sql("INSERT INTO cd_t (id, total) VALUES (3, 999)")
    }
    assert(err.getMessage.contains("GENERATED"))
    LakeSql.unregister("cd_t")
  }

  test("COPY INTO fills defaults and computes generated columns") {
    import spark.implicits._
    val p = fresh()
    val src = Files.createTempDirectory("cd-src").toString
    spark.sql(s"""CREATE TABLE cd_copy (
                 |  id BIGINT, qty BIGINT DEFAULT 7,
                 |  total BIGINT GENERATED ALWAYS AS (id + qty))
                 |USING graftlake LOCATION '$p'""".stripMargin)
    Seq(10L, 20L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(src + "/d")
    val (_, f, r) = GraftLake.copyInto(spark, p, src + "/d")
    assert(f >= 1 && r == 2)
    val rows = GraftLake.read(spark, p).orderBy(col("id")).collect()
    assert(rows.map(_.toSeq).toSeq ==
      Seq(Seq(10L, 7L, 17L), Seq(20L, 7L, 27L)))
    // a source carrying the generated column refuses
    val bad = Files.createTempDirectory("cd-bad").toString
    Seq((30L, 1L, 99L)).toDF("id", "qty", "total").coalesce(1)
      .write.mode("overwrite").parquet(bad + "/d")
    val err = intercept[Exception] {
      GraftLake.copyInto(spark, p, bad + "/d")
    }
    assert(err.getMessage.contains("GENERATED"))
    LakeSql.unregister("cd_copy")
  }

  test("coldefs ride checkpoints and shallow clones; validation refuses junk") {
    val p = fresh()
    spark.sql(s"""CREATE TABLE cd_ck (id BIGINT, qty BIGINT DEFAULT 3)
                 |USING graftlake LOCATION '$p'""".stripMargin)
    spark.sql("INSERT INTO cd_ck (id) VALUES (1)")
    GraftLake.checkpoint(p)
    assert(GraftLake.columnDefaultsOf(p) == Map("qty" -> "3"))
    spark.sql("INSERT INTO cd_ck (id) VALUES (2)")
    assert(GraftLake.read(spark, p)
      .agg(sum(col("qty"))).head.getLong(0) == 6L)
    // clone carries the metadata
    val c = fresh()
    GraftLake.shallowClone(p, c)
    assert(GraftLake.columnDefaultsOf(c) == Map("qty" -> "3"))
    // a DEFAULT referencing a column refuses; a GENERATED column
    // referencing a missing column refuses
    intercept[Exception] {
      GraftLake.recordColDefs(p, Seq("qty" -> "id + 1"), Seq.empty)
    }
    intercept[Exception] {
      GraftLake.recordColDefs(p, Seq.empty, Seq("id" -> "nope * 2"))
    }
    LakeSql.unregister("cd_ck")
  }

  test("SHOW TBLPROPERTIES and DESCRIBE DETAIL expose the surface") {
    val p = fresh()
    spark.sql(s"""CREATE TABLE cd_show (id BIGINT, qty BIGINT DEFAULT 2,
                 |  dbl BIGINT GENERATED ALWAYS AS (id * 2))
                 |USING graftlake LOCATION '$p'""".stripMargin)
    spark.sql("ALTER TABLE cd_show SET TBLPROPERTIES ('autoCompact'='5')")
    val props = spark.sql("SHOW TBLPROPERTIES cd_show").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("default.qty") == "2")
    assert(props("generated.dbl") == "id * 2")
    assert(props("autoCompact") == "5")
    assert(props("enableChangeDataFeed") == "false")
    val d = spark.sql("DESCRIBE DETAIL cd_show").head
    assert(d.getAs[Int]("auto_compact") == 5)
    assert(d.getAs[Int]("num_defaults") == 1)
    assert(d.getAs[Int]("num_generated") == 1)
    assert(!d.getAs[Boolean]("dv_enabled"))
    spark.sql("INSERT INTO cd_show (id) VALUES (1), (2)")
    val d2 = spark.sql("DESCRIBE DETAIL cd_show").head
    assert(d2.getAs[Long]("num_files") >= 1L)
    assert(d2.getAs[Long]("size_bytes") > 0L)
    LakeSql.unregister("cd_show")
  }
}
