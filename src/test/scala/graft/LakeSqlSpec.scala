package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

class LakeSqlSpec extends AnyFunSuite with SparkSpec {

  private def freshPair(): (String, String) = {
    val base = Files.createTempDirectory("graft-lakesql")
    (base.resolve("sql").toString, base.resolve("api").toString)
  }

  test("SQL DELETE and MERGE land the identical state as the Scala API") {
    import spark.implicits._
    val (pSql, pApi) = freshPair()
    val rows = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 10))
    val df = rows.toDF("id", "tag", "v")
    GraftLake.create(df, pSql, Some("id"))
    GraftLake.create(df, pApi, Some("id"))
    val updates = Seq((2L, "even", 999L), (3L, "odd", 888L), (100L, "new", 777L))
      .toDF("id", "tag", "v")

    LakeSql.register(spark, pSql, "lakesql_t", "id")
    updates.createOrReplaceTempView("lakesql_u")
    spark.sql("DELETE FROM lakesql_t WHERE v > 300")
    spark.sql("""MERGE INTO lakesql_t USING lakesql_u
                |ON lakesql_t.id = lakesql_u.id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    GraftLake.delete(spark, pApi, col("v") > 300, statsCol = Some("id"))
    GraftLake.merge(spark, pApi, updates, Seq("id"), "id")

    val a = GraftLake.read(spark, pSql).collect().map(_.toSeq).toSet
    val b = GraftLake.read(spark, pApi).collect().map(_.toSeq).toSet
    assert(a == b)
    // Spot-check the semantics, not just route-equality: id=2 updated,
    // id=100 inserted, id=31 (v=310) deleted and NOT resurrected.
    val byId = a.map(s => s.head.asInstanceOf[Long] -> s).toMap
    assert(byId(2L)(2) == 999L)
    assert(byId(100L)(1) == "new")
    assert(!byId.contains(31L))
  }

  test("non-canonical MERGE shapes and non-equality ON clauses are rejected") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pSql, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_t2", "id")
    Seq((1L, 20L)).toDF("id", "v").createOrReplaceTempView("lakesql_u2")
    // DELETE-when-matched is not the canonical upsert.
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO lakesql_t2 USING lakesql_u2
                  |ON lakesql_t2.id = lakesql_u2.id
                  |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("canonical"))
    // Range ON clause has no sound key-equality mapping.
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO lakesql_t2 USING lakesql_u2
                  |ON lakesql_t2.id < lakesql_u2.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("ON clause"))
  }

  test("DML over unregistered names is untouched (fails as plain Spark would)") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("id", "v").createOrReplaceTempView("plain_view")
    intercept[Exception] { spark.sql("DELETE FROM plain_view WHERE v = 2") }
  }

  test("SQL ALTER TABLE RENAME COLUMN routes to the zero-rewrite rename") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), pSql, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_t4", "id")
    spark.sql("ALTER TABLE lakesql_t4 RENAME COLUMN v TO amount")
    // Physical file untouched; logical schema renamed; the registered
    // view refreshed in-place.
    assert(GraftLake.read(spark, pSql).schema.fieldNames.toSeq ==
      Seq("id", "amount"))
    assert(spark.sql("SELECT sum(amount) FROM lakesql_t4").head.getLong(0) == 30L)
    assert(GraftLake.renamesOf(pSql) == Map("amount" -> Seq("v")))
    // Renaming the registered merge-pruning column is refused.
    val e = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE lakesql_t4 RENAME COLUMN id TO key")
    }
    assert(e.getMessage.contains("merge-pruning"))
    // Unregistered targets pass through to plain Spark (which rejects).
    intercept[Exception] {
      spark.sql("ALTER TABLE some_unregistered_t RENAME COLUMN a TO b")
    }
  }

  test("SQL MERGE honors the lake's CHECK constraints") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pSql, Some("id"))
    GraftLake.addConstraint(spark, pSql, "v_pos", "v > 0")
    LakeSql.register(spark, pSql, "lakesql_t3", "id")
    Seq((1L, -5L)).toDF("id", "v").createOrReplaceTempView("lakesql_u3")
    intercept[Exception] {
      spark.sql("""MERGE INTO lakesql_t3 USING lakesql_u3
                  |ON lakesql_t3.id = lakesql_u3.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(GraftLake.read(spark, pSql).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L)))
  }
}
