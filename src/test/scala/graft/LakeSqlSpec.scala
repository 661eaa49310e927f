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

  test("non-canonical MERGE shapes route to mergeActions; bad ON clauses still reject") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), pSql, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_t2", "id")
    Seq((1L, 20L)).toDF("id", "v").createOrReplaceTempView("lakesql_u2")
    // WHEN MATCHED THEN DELETE alone is now a legal clause shape.
    spark.sql("""MERGE INTO lakesql_t2 USING lakesql_u2
                |ON lakesql_t2.id = lakesql_u2.id
                |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(GraftLake.read(spark, pSql).collect().map(_.getLong(0)).toSeq
      == Seq(2L))
    // Range ON clause has no sound key-equality mapping.
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO lakesql_t2 USING lakesql_u2
                  |ON lakesql_t2.id < lakesql_u2.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("ON clause"))
  }

  test("SQL flexible MERGE (computed SET, matched DELETE, conditional INSERT, by-source) lands the API state") {
    import spark.implicits._
    import GraftLake.MergeClause
    val (pSql, pApi) = freshPair()
    val base = (1L to 12L).map(i => (i, i % 3, i * 10)).toDF("id", "grp", "v")
    GraftLake.create(base, pSql, Some("id"))
    GraftLake.create(base, pApi, Some("id"))
    val src = (9L to 16L).map(i => (i, i * 100)).toDF("id", "sv")

    LakeSql.register(spark, pSql, "lakesql_flex", "id")
    src.createOrReplaceTempView("lakesql_flexu")
    // Aliased target + source, every clause family, computed SET.
    spark.sql("""MERGE INTO lakesql_flex t USING lakesql_flexu s
                |ON t.id = s.id
                |WHEN MATCHED AND s.sv >= 1100 THEN UPDATE SET v = t.v + s.sv
                |WHEN MATCHED THEN DELETE
                |WHEN NOT MATCHED AND s.id % 2 = 0
                |  THEN INSERT (id, grp, v) VALUES (s.id, -1, s.sv)
                |WHEN NOT MATCHED BY SOURCE AND t.grp = 0 THEN DELETE
                |""".stripMargin)

    GraftLake.mergeActions(spark, pApi, src, Seq("id"), "id", Seq(
      MergeClause("matched", "update", Some("s.sv >= 1100"),
        Seq("v" -> "t.v + s.sv")),
      MergeClause("matched", "delete", None),
      MergeClause("notMatched", "insert", Some("s.id % 2 = 0"),
        Seq("id" -> "s.id", "grp" -> "-1", "v" -> "s.sv")),
      MergeClause("bySource", "delete", Some("t.grp = 0"))))

    val a = GraftLake.read(spark, pSql).collect().map(_.toSeq).toSet
    val b = GraftLake.read(spark, pApi).collect().map(_.toSeq).toSet
    assert(a == b)
    // The registered view refreshed: SQL reads see the merge.
    assert(spark.sql("SELECT count(*) FROM lakesql_flex").head.getLong(0)
      == a.size.toLong)
    // Spot-check semantics end to end: 11 updated, 9 matched-deleted,
    // 3 by-source-deleted, 14 inserted, 13 (odd) dropped.
    val byId = a.map(s => s.head.asInstanceOf[Long] -> s).toMap
    assert(byId(11L)(2) == 110L + 1100L)
    assert(!byId.contains(9L) && !byId.contains(3L) && !byId.contains(13L))
    assert(byId(14L)(1) == -1L)
  }

  test("MERGE attributes with unknown or nested qualifiers fail loudly") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pSql, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_rq", "id")
    Seq((1L, 99L)).toDF("id", "sv").createOrReplaceTempView("lakesql_rqu")
    // Unknown qualifier: must fail LOUDLY — either the analyzer's
    // unresolved-column error or reQualify's refusal — never a silent
    // collapse to the bare leaf (which could reattach the reference
    // to the wrong side and commit wrong data).
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO lakesql_rq t USING lakesql_rqu s
                  |ON t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET v = zz.sv""".stripMargin)
    }
    assert(e1.getMessage.contains("unsupported attribute") ||
      e1.getMessage.contains("zz"))
    // Nested struct path under a known alias: same loud refusal.
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO lakesql_rq t USING lakesql_rqu s
                  |ON t.id = s.id
                  |WHEN MATCHED AND t.addr.city = 'x' THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("unsupported attribute") ||
      e2.getMessage.contains("addr"))
    // The table is untouched by either refusal.
    assert(GraftLake.read(spark, pSql).head.getLong(1) == 10L)
  }

  test("SQL MERGE with star clauses + conditions routes through mergeActions") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create(
      (1L to 6L).map(i => (i, i % 2, i * 10)).toDF("id", "grp", "v"),
      pSql, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_star", "id")
    (4L to 9L).map(i => (i, 7L, i * 1000)).toDF("id", "grp", "v")
      .createOrReplaceTempView("lakesql_staru")
    // Conditioned UPDATE SET * / INSERT * are NOT the canonical
    // upsert — they compile to star mergeActions clauses.
    spark.sql("""MERGE INTO lakesql_star USING lakesql_staru
                |ON lakesql_star.id = lakesql_staru.id
                |WHEN MATCHED AND lakesql_staru.v > 4000 THEN UPDATE SET *
                |WHEN NOT MATCHED AND lakesql_staru.id < 9 THEN INSERT *
                |""".stripMargin)
    val got = GraftLake.read(spark, pSql).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 5,6 star-updated; 4 matched but fails the cond -> unchanged;
    // 7,8 insert; 9 fails the insert cond -> dropped.
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L,
      5L -> 5000L, 6L -> 6000L, 7L -> 7000L, 8L -> 8000L))
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

  test("SQL UPDATE lands the identical state as the Scala API update") {
    import spark.implicits._
    val (pSql, pApi) = freshPair()
    val rows = (1L to 30L).map(i => (i, i * 10, i * 100))
    val df = rows.toDF("id", "a", "b")
    GraftLake.create(df, pSql, Some("id"))
    GraftLake.create(df, pApi, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_t4", "id")
    // Simultaneous-assignment semantics: every RHS reads the OLD row.
    spark.sql("UPDATE lakesql_t4 SET a = b + 1, b = a WHERE id % 3 = 0")
    GraftLake.update(spark, pApi, col("id") % 3 === 0,
      Seq("a" -> (col("b") + 1), "b" -> col("a")), Some("id"))
    val a = GraftLake.read(spark, pSql).collect().map(_.toSeq).toSet
    val b = GraftLake.read(spark, pApi).collect().map(_.toSeq).toSet
    assert(a == b)
    val byId = a.map(s => s.head.asInstanceOf[Long] -> s).toMap
    assert(byId(3L)(1) == 301L && byId(3L)(2) == 30L) // swapped, not cascaded
    assert(byId(4L)(1) == 40L && byId(4L)(2) == 400L) // untouched
    // No-WHERE UPDATE hits every row.
    spark.sql("UPDATE lakesql_t4 SET a = 0")
    assert(GraftLake.read(spark, pSql).filter(col("a") =!= 0).count() == 0)
    // Unknown assignment column fails loudly.
    intercept[Exception] { spark.sql("UPDATE lakesql_t4 SET nope = 1") }
  }

  test("update prunes by zone maps and feeds CDF pre/post images") {
    import spark.implicits._
    val (p, _) = freshPair()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    GraftLake.append((11L to 20L).map(i => (i, i)).toDF("id", "v"), p,
      statsCol = Some("id"))
    GraftLake.enableCdf(p)
    // Predicate only matches the second set: exactly one rewrite.
    val (_, rew, kept, n) = GraftLake.update(spark, p, col("id") === 15L,
      Seq("v" -> lit(999L)), Some("id"))
    assert(rew == 1 && kept == 1 && n == 1L)
    val feed = GraftLake.changesTyped(spark, p, 1).collect().map(r => (
      r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(feed == Set((15L, 15L, "update_preimage"),
      (15L, 999L, "update_postimage")))
    // A no-match update commits nothing.
    val v0 = GraftLake.latestVersion(p)
    val (v1, r1, _, n1) = GraftLake.update(spark, p, col("id") === 999L,
      Seq("v" -> lit(0L)), Some("id"))
    assert(v1 == v0 && r1 == 0 && n1 == 0L)
  }

  test("SQL VERSION AS OF and TIMESTAMP AS OF read the lake's history") {
    import spark.implicits._
    val (p, _) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), p, Some("id"))   // v0
    val tsAfterV0 = GraftLake.commits(p).last.tsMillis
    Thread.sleep(5)
    GraftLake.append(Seq((2L, 20L)).toDF("id", "v"), p)               // v1
    GraftLake.update(spark, p, col("id") === 1L,
      Seq("v" -> lit(99L)), Some("id"))                               // v2
    LakeSql.register(spark, p, "lakesql_tt", "id")
    def ids(sql: String): Set[(Long, Long)] =
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids("SELECT id, v FROM lakesql_tt VERSION AS OF 0") ==
      Set((1L, 10L)))
    assert(ids("SELECT id, v FROM lakesql_tt VERSION AS OF 1") ==
      Set((1L, 10L), (2L, 20L)))
    assert(ids("SELECT id, v FROM lakesql_tt VERSION AS OF 2") ==
      Set((1L, 99L), (2L, 20L)))
    // Aggregations compose over the travel read.
    assert(spark.sql(
      "SELECT sum(v) FROM lakesql_tt VERSION AS OF 1").head.getLong(0) == 30L)
    // Timestamp travel: epoch-millis literal as of v0's commit stamp.
    assert(ids(
      s"SELECT id, v FROM lakesql_tt TIMESTAMP AS OF '$tsAfterV0'") ==
      Set((1L, 10L)))
    // Bad version / pre-creation timestamp fail loudly.
    intercept[Exception] {
      spark.sql("SELECT id FROM lakesql_tt VERSION AS OF 99").collect() }
    intercept[Exception] {
      spark.sql("SELECT id FROM lakesql_tt TIMESTAMP AS OF '5'").collect() }
    // SQL RESTORE (pre-parse intercept, the Delta-parser shape): roll
    // the table back to v1, then verify the latest read.
    spark.sql("RESTORE TABLE lakesql_tt TO VERSION AS OF 1")
    LakeSql.register(spark, p, "lakesql_tt", "id") // refresh the view
    assert(ids("SELECT id, v FROM lakesql_tt") == Set((1L, 10L), (2L, 20L)))
    // Unregistered names fall through to Spark's own parse error.
    intercept[Exception] {
      spark.sql("RESTORE TABLE nope_not_lake TO VERSION AS OF 1") }
    // DESCRIBE HISTORY returns the audit rows straight off the log.
    val hist = spark.sql("DESCRIBE HISTORY lakesql_tt")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(hist.map(_._1).toSeq == hist.indices.map(identity))
    assert(hist.map(_._2).toSeq ==
      Seq("create", "append", "update", "restore"))
  }

  test("table_changes TVF serves the typed feed through SQL") {
    import spark.implicits._
    val (p, _) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableCdf(p)
    GraftLake.update(spark, p, col("id") === 1L, Seq("v" -> lit(99L)),
      Some("id"))                                                  // v1
    GraftLake.delete(spark, p, col("id") === 2L, Some("id"))       // v2
    LakeSql.register(spark, p, "lakesql_tc", "id")
    val got = spark.sql(
      "SELECT id, v, _change_type, _commit_version FROM table_changes('lakesql_tc', 0)")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    assert(got == Set(
      (1L, 10L, "update_preimage", 1), (1L, 99L, "update_postimage", 1),
      (2L, 20L, "delete", 2)))
    // Predicates compose over the TVF.
    assert(spark.sql(
      "SELECT count(*) FROM table_changes('lakesql_tc', 0) " +
        "WHERE _change_type = 'delete'").head.getLong(0) == 1L)
    // Unregistered names fall through to Spark's own TVF error.
    intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('nope', 0)").collect() }
  }

  test("SQL ADD COLUMNS / ADD CONSTRAINT / DROP CONSTRAINT route to the lake's metadata commits") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create((1L to 20L).map(i => (i, i * 10)).toDF("id", "v"), pSql,
      Some("id"))
    LakeSql.register(spark, pSql, "lakesql_ddl", "id")
    val setsBefore = GraftLake.snapshot(pSql).live.map(_.set).toSet

    // ADD COLUMNS: one metadata commit, zero data touched, reads
    // null-fill, the registered view refreshes.
    spark.sql("ALTER TABLE lakesql_ddl ADD COLUMNS (bonus BIGINT, tag STRING)")
    assert(GraftLake.snapshot(pSql).live.map(_.set).toSet == setsBefore)
    assert(GraftLake.commits(pSql).last.action == "evolve")
    val got = spark.sql("SELECT * FROM lakesql_ddl")
    assert(got.columns.toSeq == Seq("id", "v", "bonus", "tag"))
    assert(got.filter(col("bonus").isNotNull).count() == 0)
    // The new column is writable through the one write path. (DML
    // reads the CURRENT state; the registered view stays a
    // registration-time snapshot by contract, so read via the lake.)
    spark.sql("UPDATE lakesql_ddl SET bonus = v * 2 WHERE id <= 5")
    assert(GraftLake.read(spark, pSql).agg(sum(col("bonus"))).head.getLong(0)
      == (1L to 5L).map(_ * 20).sum)
    // Refusals: existing name; dropped/renamed-away names stay fenced.
    intercept[Exception] {
      spark.sql("ALTER TABLE lakesql_ddl ADD COLUMNS (v BIGINT)") }
    spark.sql("ALTER TABLE lakesql_ddl DROP COLUMN tag")
    intercept[Exception] {
      spark.sql("ALTER TABLE lakesql_ddl ADD COLUMNS (tag STRING)") }

    // ADD CONSTRAINT validates existing rows and gates later writes.
    spark.sql("ALTER TABLE lakesql_ddl ADD CONSTRAINT pos_v CHECK (v > 0)")
    assert(GraftLake.constraintsOf(pSql).contains("pos_v"))
    intercept[Exception] {
      spark.sql("INSERT INTO lakesql_ddl VALUES (99, -1, NULL)") }
    // A rule existing rows violate is refused outright.
    intercept[Exception] {
      spark.sql("ALTER TABLE lakesql_ddl ADD CONSTRAINT big_v CHECK (v > 1000)") }
    // DROP CONSTRAINT: bare form refuses unknown names, IF EXISTS is
    // a no-op; after the drop the insert lands.
    intercept[Exception] {
      spark.sql("ALTER TABLE lakesql_ddl DROP CONSTRAINT nope") }
    spark.sql("ALTER TABLE lakesql_ddl DROP CONSTRAINT IF EXISTS nope")
    spark.sql("ALTER TABLE lakesql_ddl DROP CONSTRAINT pos_v")
    spark.sql("INSERT INTO lakesql_ddl VALUES (99, -1, NULL)")
    assert(spark.sql(
      "SELECT count(*) FROM lakesql_ddl WHERE v = -1").head.getLong(0) == 1)
  }

  test("DESCRIBE DETAIL returns the one-row snapshot summary") {
    import spark.implicits._
    val (pSql, _) = freshPair()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), pSql,
      Some("id"))
    GraftLake.append((11L to 20L).map(i => (i, i)).toDF("id", "v"), pSql)
    GraftLake.enableCdf(pSql)
    GraftLake.addConstraint(spark, pSql, "pos", "v > 0")
    GraftLake.deleteMoR(spark, pSql, col("id") === 3L, "id")
    LakeSql.register(spark, pSql, "lakesql_detail", "id")
    val r = spark.sql("DESCRIBE DETAIL lakesql_detail").head
    assert(r.getString(0) == "graft-lake" && r.getString(1) == pSql)
    assert(r.getInt(2) == 3)  // v0 create, v1 append, v2 rule, v3 tombstone
    assert(r.getInt(3) == 2 && r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(r.getBoolean(6))
    intercept[Exception] { spark.sql("DESCRIBE DETAIL lakesql_nope").collect() }
  }

  test("SQL INSERT INTO lands the identical state as the Scala API append") {
    import spark.implicits._
    val (pSql, pApi) = freshPair()
    val df = (1L to 20L).map(i => (i, s"t$i", i * 10)).toDF("id", "tag", "v")
    GraftLake.create(df, pSql, Some("id"))
    GraftLake.create(df, pApi, Some("id"))
    LakeSql.register(spark, pSql, "lakesql_ins", "id")
    val more = (21L to 30L).map(i => (i, s"t$i", i * 10)).toDF("id", "tag", "v")
    more.createOrReplaceTempView("lakesql_ins_src")

    // Positional SELECT form; values store-assign (ints cast to long).
    spark.sql("INSERT INTO lakesql_ins SELECT id, tag, v FROM lakesql_ins_src")
    GraftLake.append(more, pApi, statsCol = Some("id"))
    // VALUES form.
    spark.sql("INSERT INTO lakesql_ins VALUES (31, 't31', 310)")
    GraftLake.append(Seq((31L, "t31", 310L)).toDF("id", "tag", "v"), pApi,
      statsCol = Some("id"))
    // Named-column form: missing columns null-fill.
    spark.sql("INSERT INTO lakesql_ins (v, id) VALUES (320, 32)")
    GraftLake.append(Seq((32L, null.asInstanceOf[String], 320L))
      .toDF("id", "tag", "v"), pApi, statsCol = Some("id"))

    val a = GraftLake.read(spark, pSql).collect().map(_.toSeq).toSet
    val b = GraftLake.read(spark, pApi).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 32)
    // The registered view refreshed: SQL sees its own inserts.
    assert(spark.sql("SELECT count(*) FROM lakesql_ins").head.getLong(0) == 32)
    // The appends carried zone-map stats on the registered column.
    assert(GraftLake.commits(pSql).filter(_.action == "append")
      .forall(_.stats.exists(_.col == "id")))

    // Refusals: arity mismatch, unknown named column, PARTITION clause.
    intercept[Exception] {
      spark.sql("INSERT INTO lakesql_ins VALUES (1, 'x')") }
    intercept[Exception] {
      spark.sql("INSERT INTO lakesql_ins (nope) VALUES (1)") }
    intercept[Exception] {
      spark.sql("INSERT INTO lakesql_ins PARTITION (tag='x') VALUES (1, 2)") }

    // INSERT OVERWRITE replaces the contents atomically.
    spark.sql("INSERT OVERWRITE lakesql_ins SELECT id, tag, v FROM lakesql_ins_src")
    assert(GraftLake.read(spark, pSql).count() == 10)
    assert(GraftLake.commits(pSql).last.action == "overwrite")
  }

  test("SQL CTAS creates and registers a lake; OPTIMIZE and VACUUM route to compact/vacuum") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-ctas")
    val p = base.resolve("t").toString
    (1L to 50L).map(i => (i, i % 5, i * 7)).toDF("id", "grp", "v")
      .createOrReplaceTempView("lakesql_ctas_src")
    spark.sql(
      s"""CREATE TABLE lakesql_ctas USING graftlake LOCATION '$p'
         |TBLPROPERTIES ('statscol'='id')
         |AS SELECT * FROM lakesql_ctas_src""".stripMargin)
    // A real lake table exists at the location with stats recorded.
    assert(GraftLake.commits(p).head.action == "create")
    assert(GraftLake.snapshot(p).live.forall(_.statsFor("id").isDefined))
    assert(spark.sql("SELECT count(*) FROM lakesql_ctas").head.getLong(0) == 50)
    // The registration is DML-capable: INSERT + MERGE work.
    spark.sql("INSERT INTO lakesql_ctas VALUES (51, 1, 357)")
    assert(GraftLake.read(spark, p).count() == 51)
    // IF NOT EXISTS over the existing lake is a registering no-op...
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS lakesql_ctas USING graftlake
         |LOCATION '$p' AS SELECT * FROM lakesql_ctas_src""".stripMargin)
    assert(GraftLake.read(spark, p).count() == 51)
    // ...while a bare CREATE over it refuses.
    intercept[Exception] { spark.sql(
      s"""CREATE TABLE lakesql_ctas USING graftlake LOCATION '$p'
         |AS SELECT * FROM lakesql_ctas_src""".stripMargin) }

    // OPTIMIZE: the 2 sets (create + insert) compact to 1 atomic set,
    // content-neutral.
    val opt = spark.sql("OPTIMIZE lakesql_ctas").head
    assert(opt.getInt(0) == 2 && opt.getInt(1) == 1)
    assert(GraftLake.commits(p).last.action == "compact")
    assert(GraftLake.read(spark, p).count() == 51)
    // OPTIMIZE ZORDER BY records stats on both dims.
    spark.sql("OPTIMIZE lakesql_ctas ZORDER BY (id, v)")
    assert(GraftLake.commits(p).last.stats.map(_.col).toSet == Set("id", "v"))

    // Bare VACUUM defaults to Delta's 7-day retention: nothing this
    // fresh is reclaimed, and time travel survives the footgun.
    assert(spark.sql("VACUUM lakesql_ctas").collect().isEmpty)
    // An explicit RETAIN 0 HOURS reclaims the compacted-away sets
    // and audits the sweep.
    val dead = spark.sql("VACUUM lakesql_ctas RETAIN 0 HOURS")
      .collect().map(_.getString(0))
    assert(dead.nonEmpty && dead.forall(_.startsWith("data/")))
    assert(GraftLake.commits(p).last.action == "vacuum")
    assert(GraftLake.read(spark, p).count() == 51)
    // RETAIN window: nothing inside a generous window is reclaimed.
    assert(spark.sql("VACUUM lakesql_ctas RETAIN 240 HOURS").collect().isEmpty)
    // Unregistered names fall through to Spark's own errors.
    intercept[Exception] { spark.sql("OPTIMIZE lakesql_nope").collect() }
    intercept[Exception] { spark.sql("VACUUM lakesql_nope").collect() }
  }

  test("SQL DELETE routes to deletion vectors when the table opts in; OPTIMIZE materializes") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-dv")
    val p = base.resolve("t").toString
    GraftLake.create((1L to 40L).map(i => (i, i % 4)).toDF("id", "m"), p,
      Some("id"))
    GraftLake.enableDeletionVectors(p)
    LakeSql.register(spark, p, "lakesql_dv", "id")
    val liveBefore = GraftLake.snapshot(p).live.map(_.set).toSet
    spark.sql("DELETE FROM lakesql_dv WHERE m = 0")
    // Zero rewrite: same live sets, one outstanding position sidecar.
    assert(GraftLake.snapshot(p).live.map(_.set).toSet == liveBefore)
    assert(GraftLake.snapshot(p).tombstones.size == 1)
    assert(spark.sql("SELECT count(*) FROM lakesql_dv").head.getLong(0) == 30)
    // OPTIMIZE materializes the masked state and clears the sidecar.
    spark.sql("OPTIMIZE lakesql_dv")
    assert(GraftLake.snapshot(p).tombstones.isEmpty)
    assert(spark.sql("SELECT count(*) FROM lakesql_dv").head.getLong(0) == 30)
    // An un-opted twin still deletes copy-on-write (sets rewritten).
    val p2 = base.resolve("t2").toString
    GraftLake.create((1L to 40L).map(i => (i, i % 4)).toDF("id", "m"), p2,
      Some("id"))
    LakeSql.register(spark, p2, "lakesql_dv2", "id")
    val live2 = GraftLake.snapshot(p2).live.map(_.set).toSet
    spark.sql("DELETE FROM lakesql_dv2 WHERE m = 0")
    assert(GraftLake.snapshot(p2).tombstones.isEmpty)
    assert(GraftLake.snapshot(p2).live.map(_.set).toSet != live2)
    assert(spark.sql("SELECT count(*) FROM lakesql_dv2").head.getLong(0) == 30)
  }

  test("ALTER TABLE SET TBLPROPERTIES flips the DV and CDF opt-ins from SQL") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-props")
    val p = base.resolve("t").toString
    GraftLake.create((1L to 30L).map(i => (i, i % 3)).toDF("id", "m"), p,
      Some("id"))
    LakeSql.register(spark, p, "lakesql_props", "id")
    assert(!GraftLake.dvDeletesEnabled(p) && !GraftLake.cdfEnabled(p))
    // The Delta-prefixed names work; both opt-ins in one statement.
    spark.sql(
      """ALTER TABLE lakesql_props SET TBLPROPERTIES (
        |  'delta.enableDeletionVectors' = 'true',
        |  'delta.enableChangeDataFeed' = 'true')""".stripMargin)
    assert(GraftLake.dvDeletesEnabled(p) && GraftLake.cdfEnabled(p))
    // The DML routes actually flip: DELETE now commits a sidecar.
    val liveBefore = GraftLake.snapshot(p).live.map(_.set).toSet
    val v0 = GraftLake.latestVersion(p)
    spark.sql("DELETE FROM lakesql_props WHERE m = 0")
    assert(GraftLake.snapshot(p).live.map(_.set).toSet == liveBefore)
    assert(GraftLake.snapshot(p).tombstones.size == 1)
    // ...and the CDF feed serves the delete images.
    assert(GraftLake.changesTyped(spark, p, v0)
      .filter(col("_change_type") === "delete").count() == 10)
    // Idempotent re-set; unprefixed key accepted.
    spark.sql(
      "ALTER TABLE lakesql_props SET TBLPROPERTIES ('enableDeletionVectors'='true')")
    // One-way opt-ins and unknown keys refuse loudly.
    intercept[Exception] {
      spark.sql("ALTER TABLE lakesql_props SET TBLPROPERTIES " +
        "('enableDeletionVectors'='false')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE lakesql_props SET TBLPROPERTIES ('nope'='1')")
    }
    // Unregistered names fall through to Spark's own parser/analyzer.
    intercept[Exception] {
      spark.sql("ALTER TABLE not_a_lake SET TBLPROPERTIES ('x'='y')")
    }
  }

  test("CREATE TABLE SHALLOW CLONE forks zero-copy from SQL and registers the clone") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-clone")
    val p = base.resolve("src").toString
    GraftLake.create((1L to 30L).map(i => (i, i * 10)).toDF("id", "v"), p,
      Some("id"))
    GraftLake.addConstraint(spark, p, "v_pos", "v >= 0")
    LakeSql.register(spark, p, "lakesql_clsrc", "id")
    val dst = base.resolve("dst").toString
    spark.sql(
      s"CREATE TABLE lakesql_cldst SHALLOW CLONE lakesql_clsrc LOCATION '$dst'")
    // The clone reads immediately under its registered name...
    assert(spark.sql("SELECT count(*) FROM lakesql_cldst").head.getLong(0) == 30)
    // ...evolves independently (DML on the clone, source untouched)...
    spark.sql("DELETE FROM lakesql_cldst WHERE id <= 10")
    assert(spark.sql("SELECT count(*) FROM lakesql_cldst").head.getLong(0) == 20)
    assert(spark.sql("SELECT count(*) FROM lakesql_clsrc").head.getLong(0) == 30)
    // ...and carried the source's CHECK constraints.
    intercept[Exception] {
      GraftLake.append(Seq((99L, -1L)).toDF("id", "v"), dst)
    }
    // LOCATION is required; outstanding tombstones refuse the fork.
    intercept[Exception] {
      spark.sql("CREATE TABLE lakesql_cx SHALLOW CLONE lakesql_clsrc")
    }
    GraftLake.deleteDv(spark, p, col("id") === 1)
    intercept[Exception] {
      spark.sql("CREATE TABLE lakesql_cy SHALLOW CLONE lakesql_clsrc " +
        s"LOCATION '${base.resolve("y")}'")
    }
  }

  test("OPTIMIZE WHERE compacts only the in-scope sets; out-of-scope survive by reference") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-optw")
    val p = base.resolve("t").toString
    // Four range-disjoint sets.
    GraftLake.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    Seq(101L to 200L, 201L to 300L, 301L to 400L).foreach(r =>
      GraftLake.append(r.map(i => (i, i)).toDF("id", "v"), p, Some("id")))
    LakeSql.register(spark, p, "lakesql_optw", "id")
    val live0 = GraftLake.snapshot(p).live
    val outOfScope = live0.filter(_.statsFor("id").exists(_.min > 200))
      .map(_.set).toSet
    val want = GraftLake.read(spark, p).agg(sum(col("v"))).head.getLong(0)
    val r = spark.sql("OPTIMIZE lakesql_optw WHERE id <= 200").head
    assert(r.getInt(0) == 4 && r.getInt(1) == 3) // two sets coalesced
    val after = GraftLake.snapshot(p).live
    assert(outOfScope.subsetOf(after.map(_.set).toSet))
    assert(after.map(_.set).toSet.intersect(
      live0.filterNot(ls => outOfScope(ls.set)).map(_.set).toSet).isEmpty)
    // Content-neutral.
    assert(GraftLake.read(spark, p).count() == 400)
    assert(GraftLake.read(spark, p).agg(sum(col("v"))).head.getLong(0) == want)
    // A scope matching one set is a no-op.
    val v1 = GraftLake.latestVersion(p)
    spark.sql("OPTIMIZE lakesql_optw WHERE id >= 350")
    assert(GraftLake.latestVersion(p) == v1)
    // WHERE + ZORDER refuse; outstanding sidecars refuse the scope.
    intercept[Exception] {
      spark.sql("OPTIMIZE lakesql_optw WHERE id <= 10 ZORDER BY (id, v)")
    }
    GraftLake.deleteDv(spark, p, col("id") === 5)
    intercept[Exception] {
      spark.sql("OPTIMIZE lakesql_optw WHERE id <= 200")
    }
  }

  test("VACUUM DRY RUN lists without deleting; RESTORE TO TIMESTAMP AS OF rolls back") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-dryrun")
    // RESTORE by stamp: numeric epoch and the quoted timestamp form.
    val p1 = base.resolve("t1").toString
    GraftLake.create((1L to 20L).map(i => (i, i)).toDF("id", "v"), p1, Some("id"))
    GraftLake.append((21L to 30L).map(i => (i, i)).toDF("id", "v"), p1, Some("id"))
    LakeSql.register(spark, p1, "lakesql_rts", "id")
    val ts0 = GraftLake.commits(p1).head.tsMillis
    spark.sql(s"RESTORE TABLE lakesql_rts TO TIMESTAMP AS OF $ts0")
    assert(GraftLake.read(spark, p1).count() == 20)
    // The restore is itself a commit; the quoted form rolls forward
    // to the post-append snapshot (its stamp covers version 1).
    val ts1 = new java.sql.Timestamp(GraftLake.commits(p1)(1).tsMillis)
    spark.sql(s"RESTORE TABLE lakesql_rts TO TIMESTAMP AS OF '$ts1'")
    assert(GraftLake.read(spark, p1).count() == 30)
    // DRY RUN: lists the dead sets, deletes nothing, publishes nothing.
    val p2 = base.resolve("t2").toString
    GraftLake.create((1L to 40L).map(i => (i, i % 4)).toDF("id", "m"), p2,
      Some("id"))
    LakeSql.register(spark, p2, "lakesql_dry", "id")
    spark.sql("DELETE FROM lakesql_dry WHERE m = 0") // CoW: dead set
    val vBefore = GraftLake.latestVersion(p2)
    val dry = spark.sql("VACUUM lakesql_dry RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0))
    assert(dry.nonEmpty)
    dry.foreach(s0 => assert(
      Files.exists(java.nio.file.Paths.get(p2, s0)), s"$s0 was deleted"))
    assert(GraftLake.latestVersion(p2) == vBefore) // no vacuum entry
    // The real sweep reclaims exactly what the dry run listed.
    val swept = spark.sql("VACUUM lakesql_dry RETAIN 0 HOURS")
      .collect().map(_.getString(0))
    assert(swept.toSet == dry.toSet)
    dry.foreach(s0 => assert(
      !Files.exists(java.nio.file.Paths.get(p2, s0)), s"$s0 survived"))
    assert(spark.sql("VACUUM lakesql_dry RETAIN 0 HOURS DRY RUN").count() == 0)
  }

  test("DELETE WHERE col IN (subquery) routes to distributed deleteKeys") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-delin")
    val p = base.resolve("t").toString
    // Two range-disjoint sets: an in-range key delta must shortlist 1.
    GraftLake.create((1L to 100L).map(i => (i, i)).toDF("id", "v"), p,
      Some("id"))
    GraftLake.append((101L to 200L).map(i => (i, i)).toDF("id", "v"), p,
      statsCol = Some("id"))
    LakeSql.register(spark, p, "lakesql_delin", "id")
    Seq(150L, 160L, 999L).toDF("id")
      .createOrReplaceTempView("lakesql_delin_keys")
    spark.sql("""DELETE FROM lakesql_delin
                |WHERE id IN (SELECT id FROM lakesql_delin_keys)""".stripMargin)
    // Distributed key delete, zone-shortlisted to the one hit set.
    assert(GraftLake.lastDeleteKeysShortlist.size == 1)
    assert(GraftLake.read(spark, p).count() == 198)
    assert(GraftLake.read(spark, p).filter(col("id").isin(150L, 160L))
      .count() == 0)
    // The registered view refreshed.
    assert(spark.sql("SELECT count(*) FROM lakesql_delin").head.getLong(0)
      == 198)
    // A multi-column subquery refuses loudly.
    Seq((1L, 2L)).toDF("id", "x")
      .createOrReplaceTempView("lakesql_delin_bad")
    val e = intercept[Exception] {
      spark.sql("""DELETE FROM lakesql_delin
                  |WHERE id IN (SELECT id, x FROM lakesql_delin_bad)""".stripMargin)
    }
    assert(e.getMessage.contains("ONE column") ||
      e.getMessage.toLowerCase.contains("number of columns"))
    // Plain predicate deletes still take the predicate route.
    spark.sql("DELETE FROM lakesql_delin WHERE id = 1")
    assert(GraftLake.read(spark, p).count() == 197)
  }

  test("partitioned CTAS + INSERT PARTITION: per-value layout, static overwrite replaces only its partition") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-part")
    val p = base.resolve("t").toString
    (1L to 60L).map(i => (i, i % 3, i * 7)).toDF("id", "yr", "v")
      .createOrReplaceTempView("lakesql_part_src")
    // CTAS PARTITIONED BY seeds the exact per-value layout.
    spark.sql(
      s"""CREATE TABLE lakesql_part USING graftlake LOCATION '$p'
         |PARTITIONED BY (yr) TBLPROPERTIES ('statscol'='id')
         |AS SELECT * FROM lakesql_part_src WHERE yr < 2""".stripMargin)
    assert(GraftLake.partitionColumnOf(p).contains("yr"))
    assert(GraftLake.snapshot(p).live.size == 2)
    assert(GraftLake.snapshot(p).live
      .forall(_.statsFor("yr").exists(st => st.min == st.max)))
    // DESCRIBE DETAIL reports the layout column.
    assert(spark.sql("DESCRIBE DETAIL lakesql_part")
      .select(col("partition_column")).head.getString(0) == "yr")
    // Dynamic INSERT PARTITION keeps the per-value layout.
    spark.sql("""INSERT INTO lakesql_part PARTITION (yr)
                |SELECT * FROM lakesql_part_src WHERE yr = 2""".stripMargin)
    assert(GraftLake.snapshot(p).live.size == 3)
    assert(GraftLake.read(spark, p).count() == 60)
    // Static INSERT PARTITION (yr=9): the query feeds the OTHER
    // columns; the pinned value fills the layout column.
    spark.sql(
      "INSERT INTO lakesql_part PARTITION (yr=9) VALUES (100, 700), (101, 707)")
    assert(GraftLake.read(spark, p).filter(col("yr") === 9).count() == 2)
    // Static OVERWRITE replaces exactly its partition; the other
    // partitions' file-sets survive BY REFERENCE.
    val before = GraftLake.snapshot(p).live
      .filterNot(_.statsFor("yr").exists(st => st.min == 9L && st.max == 9L))
      .map(_.set).toSet
    spark.sql(
      "INSERT OVERWRITE lakesql_part PARTITION (yr=9) VALUES (200, 900)")
    val after = GraftLake.snapshot(p).live.map(_.set).toSet
    assert(before.subsetOf(after))
    val got9 = GraftLake.read(spark, p).filter(col("yr") === 9).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got9 == Set((200L, 900L)))
    assert(GraftLake.read(spark, p).count() == 61)
  }

  test("partitioned INSERT refusals: wrong column, multi-column, dynamic overwrite, pinned column listed") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-partref")
    val p = base.resolve("t").toString
    (1L to 10L).map(i => (i, i % 2, i)).toDF("id", "yr", "v")
      .createOrReplaceTempView("lakesql_pref_src")
    spark.sql(
      s"""CREATE TABLE lakesql_pref USING graftlake LOCATION '$p'
         |PARTITIONED BY (yr) TBLPROPERTIES ('statscol'='id')
         |AS SELECT * FROM lakesql_pref_src""".stripMargin)
    // PARTITION over a column that is not the recorded layout column.
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO lakesql_pref PARTITION (v=1) VALUES (11, 11)")
    }
    assert(e1.getMessage.contains("layout is (yr)"))
    // A spec wider than the recorded layout is a layout mismatch.
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO lakesql_pref PARTITION (yr=1, v=1) VALUES (11)")
    }
    assert(e2.getMessage.contains("layout is (yr)"))
    // A BARE overwrite (no PARTITION clause) would drop the layout —
    // the refusal points at the static and dynamic PARTITION forms.
    val e3 = intercept[Exception] {
      spark.sql("""INSERT OVERWRITE lakesql_pref
                  |SELECT * FROM lakesql_pref_src""".stripMargin)
    }
    assert(e3.getMessage.contains("PARTITION clause"))
    // The pinned layout column must not also appear in the insert list.
    val e4 = intercept[Exception] {
      spark.sql("""INSERT INTO lakesql_pref PARTITION (yr=1) (id, yr, v)
                  |VALUES (11, 1, 11)""".stripMargin)
    }
    assert(e4.getMessage.contains("pinned"))
    // PARTITION on an UNpartitioned lake refuses.
    val base2 = Files.createTempDirectory("graft-lakesql-partref2")
    val p2 = base2.resolve("t").toString
    spark.sql(
      s"""CREATE TABLE lakesql_pref_flat USING graftlake LOCATION '$p2'
         |AS SELECT * FROM lakesql_pref_src""".stripMargin)
    val e5 = intercept[Exception] {
      spark.sql("INSERT INTO lakesql_pref_flat PARTITION (yr=1) VALUES (11, 11)")
    }
    assert(e5.getMessage.contains("not a partitioned lake table"))
    // Multi-column PARTITIONED BY CTAS records the tuple layout (the
    // full surface is pinned in LakeMultiPartitionSpec + src51).
    val base3 = Files.createTempDirectory("graft-lakesql-partref3")
    val p3 = base3.resolve("t").toString
    spark.sql(
      s"""CREATE TABLE lakesql_pref_multi USING graftlake
         |LOCATION '$p3' PARTITIONED BY (yr, v)
         |AS SELECT * FROM lakesql_pref_src""".stripMargin)
    assert(GraftLake.partitionColumnsOf(p3) == Seq("yr", "v"))
    assert(GraftLake.read(spark, p3).count() == 10)
    // Nothing landed through any refusal.
    assert(GraftLake.read(spark, p).count() == 10)
  }

  test("dynamic INSERT OVERWRITE PARTITION (c) replaces exactly the query's partitions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-lakesql-dynow")
    val p = base.resolve("t").toString
    (1L to 60L).map(i => (i, i % 3, i)).toDF("id", "yr", "v")
      .createOrReplaceTempView("lakesql_dynow_src")
    spark.sql(
      s"""CREATE TABLE lakesql_dynow USING graftlake LOCATION '$p'
         |PARTITIONED BY (yr) TBLPROPERTIES ('statscol'='id')
         |AS SELECT * FROM lakesql_dynow_src""".stripMargin)
    val before = GraftLake.snapshot(p).live
    val kept0 = before
      .filter(_.statsFor("yr").exists(st => st.min == 0L && st.max == 0L))
      .map(_.set).toSet
    assert(kept0.nonEmpty)
    // Replace partitions 1 and 2 (present in the query); 0 survives
    // BY REFERENCE.
    spark.sql("""INSERT OVERWRITE lakesql_dynow PARTITION (yr)
                |SELECT id + 1000, yr, v * 10 FROM lakesql_dynow_src
                |WHERE yr IN (1, 2)""".stripMargin)
    val after = GraftLake.snapshot(p)
    assert(kept0.subsetOf(after.live.map(_.set).toSet))
    // The replaced partitions landed fresh sets with exact manifests.
    assert(after.live.forall(_.statsFor("yr").exists(st => st.min == st.max)))
    assert(GraftLake.read(spark, p).count() == 60)
    assert(GraftLake.read(spark, p)
      .filter(col("yr") =!= 0 && col("id") <= 1000).count() == 0)
    // Partition 0 content is untouched.
    assert(GraftLake.read(spark, p).filter(col("yr") === 0)
      .agg(sum(col("v"))).head.getLong(0)
      == (1L to 60L).filter(_ % 3 == 0).sum)
    // Idempotent: re-running the same overwrite lands the same state.
    spark.sql("""INSERT OVERWRITE lakesql_dynow PARTITION (yr)
                |SELECT id + 1000, yr, v * 10 FROM lakesql_dynow_src
                |WHERE yr IN (1, 2)""".stripMargin)
    assert(GraftLake.read(spark, p).count() == 60)
    // A layout widened by a flat append refuses loudly — the impure
    // set can be neither dropped nor kept by reference.
    GraftLake.append(
      Seq((2000L, 1L, 1L), (2001L, 2L, 1L)).toDF("id", "yr", "v"), p)
    val e = intercept[Exception] {
      spark.sql("""INSERT OVERWRITE lakesql_dynow PARTITION (yr)
                  |SELECT * FROM lakesql_dynow_src WHERE yr = 1""".stripMargin)
    }
    assert(e.getMessage.contains("compactPartitioned"))
    // compactPartitioned restores the layout; the overwrite then runs.
    GraftLake.compactPartitioned(spark, p, "yr", Seq("id"))
    spark.sql("""INSERT OVERWRITE lakesql_dynow PARTITION (yr)
                |SELECT * FROM lakesql_dynow_src WHERE yr = 1""".stripMargin)
    assert(GraftLake.read(spark, p).filter(col("yr") === 1).count() == 20)
    assert(GraftLake.read(spark, p).filter(col("yr") === 2).count() == 21)
  }

  /** Read `path` from ANOTHER thread — the public (non-transaction)
    * view, since SQL transactions are thread-scoped.
    */
  private def publicCount(path: String): Long = {
    @volatile var n = -1L
    val t = new Thread(() => n = GraftLake.read(spark, path).count())
    t.start(); t.join()
    n
  }

  test("BEGIN TRANSACTION / COMMIT: provisional commits land all-or-nothing") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pa, Some("id"))
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pb, Some("id"))
    LakeSql.register(spark, pa, "txnsql_a", "id")
    LakeSql.register(spark, pb, "txnsql_b", "id")
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txnsql_a VALUES (2, 20)")
    spark.sql("INSERT INTO txnsql_b VALUES (3, 30), (4, 40)")
    // ISOLATION: no other thread sees the pending rows...
    assert(publicCount(pa) == 1 && publicCount(pb) == 1)
    // ...but THIS transaction reads its own writes
    assert(GraftLake.read(spark, pa).count() == 2)
    assert(GraftLake.read(spark, pb).count() == 3)
    spark.sql("COMMIT")
    assert(publicCount(pa) == 2 && publicCount(pb) == 3)
    val ha = GraftLake.history(spark, pa).collect().map(_.getString(1))
    assert(ha.toSeq == Seq("create", "append"))
    // ROLLBACK leaves zero trace
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txnsql_a VALUES (9, 90)")
    spark.sql("ROLLBACK")
    assert(GraftLake.read(spark, pa).count() == 2)
    // a CHECK-violating statement refuses AT STATEMENT TIME (eager
    // validation); ROLLBACK then buries the earlier valid statement —
    // all-or-nothing holds
    GraftLake.addConstraint(spark, pb, "v_small", "v < 100")
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txnsql_a VALUES (5, 50)")
    intercept[Exception](spark.sql("INSERT INTO txnsql_b VALUES (6, 600)"))
    spark.sql("ROLLBACK")
    assert(publicCount(pa) == 2 && publicCount(pb) == 3)
    // single-table transaction works
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txnsql_a VALUES (7, 70)")
    spark.sql("COMMIT")
    assert(GraftLake.read(spark, pa).count() == 3)
    // an EMPTY transaction commits as a no-op
    spark.sql("BEGIN TRANSACTION")
    spark.sql("COMMIT")
    // refusals: nested BEGIN, COMMIT with nothing open, non-append
    // insert shapes inside a transaction
    spark.sql("BEGIN TRANSACTION")
    val e1 = intercept[Exception](spark.sql("BEGIN TRANSACTION"))
    assert(e1.getMessage.contains("already open"))
    val e2 = intercept[Exception](
      spark.sql("INSERT OVERWRITE txnsql_a VALUES (1, 1)"))
    assert(e2.getMessage.contains("only plain appends"))
    spark.sql("ROLLBACK")
    val e3 = intercept[Exception](spark.sql("COMMIT"))
    assert(e3.getMessage.contains("no open SQL transaction"))
  }

  test("two INSERTs into the SAME table inside one transaction land together") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pa, Some("id"))
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pb, Some("id"))
    LakeSql.register(spark, pa, "txndup_a", "id")
    LakeSql.register(spark, pb, "txndup_b", "id")
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txndup_a VALUES (2, 20)")
    spark.sql("INSERT INTO txndup_a VALUES (3, 30)")
    spark.sql("INSERT INTO txndup_b VALUES (4, 40)")
    // isolation across all three statements
    assert(publicCount(pa) == 1 && publicCount(pb) == 1)
    spark.sql("COMMIT")
    assert(spark.sql("SELECT id FROM txndup_a ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(GraftLake.read(spark, pb).count() == 2)
    // each statement is its own provisional commit riding ONE
    // decision — history shows both appends
    assert(GraftLake.history(spark, pa).collect().map(_.getString(1))
      .toSeq == Seq("create", "append", "append"))
    // degenerate same-table-only transaction
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txndup_a VALUES (5, 50)")
    spark.sql("INSERT INTO txndup_a VALUES (6, 60)")
    spark.sql("COMMIT")
    assert(GraftLake.read(spark, pa).count() == 5)
  }

  test("DELETE/UPDATE/MERGE stage transactionally: mixed txn lands all-or-nothing, ROLLBACK zero trace") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), pa, Some("id"))
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pb, Some("id"))
    LakeSql.register(spark, pa, "txndml_a", "id")
    LakeSql.register(spark, pb, "txndml_b", "id")
    def stateA: Seq[(Long, Long)] =
      GraftLake.read(spark, pa).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // ---- ROLLBACK leg first: mixed DML leaves ZERO trace
    val before = stateA
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txndml_a VALUES (3, 30)")
    spark.sql("DELETE FROM txndml_a WHERE id = 1")
    spark.sql("UPDATE txndml_a SET v = 99 WHERE id = 2")
    // read-your-writes saw all three
    assert(stateA == Seq((2L, 99L), (3L, 30L)))
    // the public view saw none of them
    assert(publicCount(pa) == 2)
    spark.sql("ROLLBACK")
    assert(stateA == before)
    // ---- COMMIT leg: INSERT + DELETE + MERGE land together
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txndml_a VALUES (3, 30)")
    spark.sql("DELETE FROM txndml_a WHERE id = 1")
    spark.sql("""MERGE INTO txndml_a USING (SELECT CAST(2 AS BIGINT) AS id,
                |  CAST(222 AS BIGINT) AS v
                |  UNION ALL SELECT CAST(4 AS BIGINT), CAST(44 AS BIGINT)) s
                |ON txndml_a.id = s.id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(publicCount(pa) == 2) // still isolated
    spark.sql("COMMIT")
    assert(stateA == Seq((2L, 222L), (3L, 30L), (4L, 44L)))
    assert(publicCount(pa) == 3)
    // ---- statements that cannot stage still refuse loudly
    spark.sql("BEGIN TRANSACTION")
    def refused(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains("BEGIN TRANSACTION"), sql)
    }
    refused("TRUNCATE TABLE txndml_a")
    refused("RESTORE TABLE txndml_a TO VERSION AS OF 0")
    val convDir = Files.createTempDirectory("graft-conv").toString
    refused(s"CONVERT TO DELTA '$convDir/d' FROM txndml_a")
    refused(s"CONVERT TO ICEBERG '$convDir/i' FROM txndml_a")
    refused(s"CONVERT FROM DELTA '$convDir/d' TO GRAFTLAKE '$convDir/g'")
    refused(s"CONVERT FROM ICEBERG '$convDir/i' TO GRAFTLAKE '$convDir/g'")
    spark.sql("ROLLBACK")
    // after ROLLBACK the same verbs run again, durably
    spark.sql("DELETE FROM txndml_a WHERE id = 4")
    assert(publicCount(pa) == 2)
  }

  test("SQL transactions are thread-scoped: a concurrent INSERT is never captured") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pa, Some("id"))
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pb, Some("id"))
    LakeSql.register(spark, pa, "txniso_a", "id")
    LakeSql.register(spark, pb, "txniso_b", "id")
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txniso_a VALUES (2, 20)")
    // another thread's INSERT lands IMMEDIATELY — it must not stage
    // into (or be held back by) this thread's open transaction
    val t = new Thread(() => spark.sql("INSERT INTO txniso_b VALUES (3, 30)"))
    t.start(); t.join()
    assert(GraftLake.read(spark, pb).count() == 2) // landed durably
    assert(publicCount(pa) == 1) // ours still pending to others
    spark.sql("COMMIT")
    assert(publicCount(pa) == 2)
    // and the other thread's COMMIT sees no open transaction
    @volatile var msg = ""
    val t2 = new Thread(() => {
      spark.sql("BEGIN TRANSACTION")
      spark.sql("ROLLBACK")
      try spark.sql("COMMIT") catch { case e: Exception => msg = e.getMessage }
    })
    t2.start(); t2.join()
    assert(msg.contains("no open SQL transaction"))
  }

  test("schema/constraint DDL waits for an undecided transaction") {
    import spark.implicits._
    val (pa, _) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), pa, Some("id"))
    LakeSql.register(spark, pa, "txnddl_a", "id")
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txnddl_a VALUES (3, -5)")
    // a CHECK added now would bypass validation of the pending row;
    // a rename would re-base a schema the pending commit baked
    @volatile var m1 = ""; @volatile var m2 = ""
    val t1 = new Thread(() =>
      try GraftLake.addConstraint(spark, pa, "pos_v", "v >= 0")
      catch { case e: Exception => m1 = e.getMessage })
    t1.start(); t1.join()
    val t2 = new Thread(() =>
      try GraftLake.renameColumn(pa, "v", "w")
      catch { case e: Exception => m2 = e.getMessage })
    t2.start(); t2.join()
    assert(m1.contains("UNDECIDED transaction"), m1)
    assert(m2.contains("UNDECIDED transaction"), m2)
    spark.sql("COMMIT")
    // after the decision both DDLs land (rename first — a rule
    // referencing the old name would fence the rename)
    GraftLake.renameColumn(pa, "v", "w")
    GraftLake.addConstraint(spark, pa, "pos_w", "w >= -100")
    assert(GraftLake.read(spark, pa).columns.toSeq == Seq("id", "w"))
    assert(GraftLake.read(spark, pa).count() == 3)
  }

  test("DV-route DML stages transactionally; CDF tables refuse in-transaction writes") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      pa, Some("id"))
    GraftLake.enableDeletionVectors(pa)
    LakeSql.register(spark, pa, "txndv_a", "id")
    // the merge-on-read DELETE (position sidecar, zero rewrite) rides
    // the transaction token like any other DML
    spark.sql("BEGIN TRANSACTION")
    spark.sql("DELETE FROM txndv_a WHERE id = 1")
    assert(GraftLake.read(spark, pa).count() == 2) // read-your-writes
    assert(publicCount(pa) == 3)                   // isolated
    spark.sql("ROLLBACK")
    assert(GraftLake.read(spark, pa).count() == 3) // zero trace
    spark.sql("BEGIN TRANSACTION")
    spark.sql("DELETE FROM txndv_a WHERE id = 1")
    spark.sql("COMMIT")
    assert(publicCount(pa) == 2)
    // CDF-enabled tables refuse in-transaction writes loudly (the
    // change feed indexes versions assuming visibility is final)
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), pb, Some("id"))
    GraftLake.enableCdf(pb)
    LakeSql.register(spark, pb, "txncdf_b", "id")
    spark.sql("BEGIN TRANSACTION")
    val e = intercept[Exception](
      spark.sql("INSERT INTO txncdf_b VALUES (2, 20)"))
    assert(e.getMessage.contains("CDF-enabled"))
    spark.sql("ROLLBACK")
    assert(GraftLake.read(spark, pb).count() == 1)
  }

  test("racing writers and an undecided transaction: claims hold, conflicts abort loudly") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      pa, Some("id"))
    LakeSql.register(spark, pa, "txnrace_a", "id")
    // our transaction REWRITES the table's only set (CoW delete)
    spark.sql("BEGIN TRANSACTION")
    spark.sql("DELETE FROM txnrace_a WHERE id = 1")
    // a racing writer's rewrite of the SAME set refuses while the
    // transaction is undecided (the claim is held across the txn)
    @volatile var raceMsg = ""
    val t = new Thread(() => {
      try GraftLake.delete(spark, pa,
        org.apache.spark.sql.functions.col("id") === 2L, Some("id"))
      catch { case e: Exception => raceMsg = e.getMessage }
    })
    t.start(); t.join()
    assert(raceMsg.contains("UNDECIDED transaction"), raceMsg)
    // a racing BLIND APPEND composes fine (no claim touched)
    val t2 = new Thread(() =>
      GraftLake.append(Seq((9L, 90L)).toDF("id", "v"), pa,
        statsCol = Some("id")))
    t2.start(); t2.join()
    assert(publicCount(pa) == 4) // 3 original + the append
    // COMMIT lands our delete on top; final = append + delete both
    spark.sql("COMMIT")
    assert(publicCount(pa) == 3) // id 1 gone, id 9 in
    assert(GraftLake.read(spark, pa).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 9L))
    // after the decision, the raced rewrite succeeds on retry
    GraftLake.delete(spark, pa,
      org.apache.spark.sql.functions.col("id") === 2L, Some("id"))
    assert(publicCount(pa) == 2)
  }

  test("CONVERT TO ICEBERG / CONVERT FROM ICEBERG round-trip through SQL") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sqliceberg")
    val gp = base.resolve("src").toString
    val ip = base.resolve("iceberg").toString
    val gp2 = base.resolve("back").toString
    GraftLake.create(
      (1L to 30L).map(i => (i, s"r$i")).toDF("id", "tag"), gp, Some("id"))
    LakeSql.register(spark, gp, "convice_t", "id")
    spark.sql(s"CONVERT TO ICEBERG '$ip' FROM convice_t")
    assert(Files.exists(java.nio.file.Paths.get(ip, "metadata",
      "version-hint.text")))
    spark.sql(
      s"CONVERT FROM ICEBERG '$ip' TO GRAFTLAKE '$gp2' AS convice_back STATSCOL 'id'")
    assert(spark.sql("SELECT count(*) FROM convice_back").head.getLong(0) == 30L)
    // the registered import is DML-capable
    spark.sql("DELETE FROM convice_back WHERE id <= 10")
    assert(GraftLake.read(spark, gp2).count() == 20)
    // MoR state exports MATERIALIZED: the iceberg copy of the mutated
    // table serves the visible rows
    LakeSql.register(spark, gp2, "convice_back2", "id")
    val ip2 = base.resolve("iceberg2").toString
    spark.sql(s"CONVERT TO ICEBERG '$ip2' FROM convice_back2")
    val (out, st) = graft.sources.IcebergImport.readIceberg(spark, ip2)
    assert(st.formatVersion == 2 && out.count() == 20)
  }

  test("CONVERT TO DELTA / CONVERT FROM DELTA round-trip through SQL") {
    import spark.implicits._
    val (gp, _) = freshPair()
    val base = Files.createTempDirectory("graft-sqldelta")
    val dp = base.resolve("delta").toString
    val gp2 = base.resolve("back").toString
    GraftLake.create(
      (1L to 30L).map(i => (i, s"r$i")).toDF("id", "tag"), gp, Some("id"))
    LakeSql.register(spark, gp, "convsql_t", "id")
    spark.sql(s"CONVERT TO DELTA '$dp' FROM convsql_t")
    // the export is a valid public-protocol delta table
    assert(Files.exists(java.nio.file.Paths.get(dp, "_delta_log")))
    spark.sql(
      s"CONVERT FROM DELTA '$dp' TO GRAFTLAKE '$gp2' AS convsql_back STATSCOL 'id'")
    assert(spark.sql("SELECT count(*) FROM convsql_back").head.getLong(0) == 30L)
    // the registered import is DML-capable
    spark.sql("DELETE FROM convsql_back WHERE id <= 10")
    assert(GraftLake.read(spark, gp2).count() == 20)
  }

  test("overwrite waits for an undecided transaction (staged sets must not survive it)") {
    import spark.implicits._
    val (pa, pb) = freshPair()
    GraftLake.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), pa, Some("id"))
    LakeSql.register(spark, pa, "txnow_a", "id")
    spark.sql("BEGIN TRANSACTION")
    spark.sql("INSERT INTO txnow_a VALUES (3, 30)")
    // a racing overwrite computes its remove list from the PUBLIC
    // view; landing now would let the pending insert's staged set
    // survive "replace everything" — it must wait for the decision
    @volatile var msg = ""
    val t = new Thread(() => {
      try GraftLake.overwrite(Seq((9L, 90L)).toDF("id", "v"), pa)
      catch { case e: Exception => msg = e.getMessage }
    })
    t.start(); t.join()
    assert(msg.contains("UNDECIDED transaction"), msg)
    spark.sql("COMMIT")
    assert(publicCount(pa) == 3)
    // decided: the overwrite now succeeds and owns the table
    GraftLake.overwrite(Seq((9L, 90L)).toDF("id", "v"), pa)
    assert(publicCount(pa) == 1)
  }

  test("ROLLBACK of an in-transaction partitioned append reclaims its staged sets") {
    import spark.implicits._
    val (pa, _) = freshPair()
    GraftLake.appendPartitionedBy(
      Seq((1L, 1L, 10L)).toDF("yr", "id", "v"), pa, Seq("yr"),
      statsCols = Seq("id"))
    val before = GraftLake.read(spark, pa).count()
    spark.sql("BEGIN TRANSACTION")
    GraftLake.appendPartitionedBy(
      Seq((2L, 2L, 20L), (3L, 3L, 30L)).toDF("yr", "id", "v"), pa, Seq("yr"),
      statsCols = Seq("id"))
    // the staged padd commit is a MULTI-LINE log file (header +
    // per-set manifest lines); reclaim must parse the HEADER only
    val v = GraftLake.latestVersion(pa)
    val txt = Files.readString(java.nio.file.Paths.get(
      pa, "_graft_log", f"$v%08d.json"))
    assert(txt.contains("\n"), "expected a multi-line padd commit")
    spark.sql("ROLLBACK")
    assert(GraftLake.read(spark, pa).count() == before)
    // every staged set directory of the rolled-back append is gone
    import scala.jdk.CollectionConverters._
    val dataDir = java.nio.file.Paths.get(pa, "data")
    val leftover = Files.list(dataDir).iterator().asScala
      .map("data/" + _.getFileName.toString).toSeq
    val liveSets = GraftLake.snapshot(pa).live.map(_.set).toSet
    assert(leftover.forall(liveSets), s"leaked staged sets: " +
      leftover.filterNot(liveSets).mkString(", "))
  }
}
