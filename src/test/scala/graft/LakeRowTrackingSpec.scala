package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Row tracking: contiguous per-set id ranges claimed from the
  * monotone high-water mark inside the publish loop; `_row_id` served
  * from base + file offset + row index; ids STABLE under the
  * merge-on-read mutation family, fresh on copy-on-write rewrites.
  */
class LakeRowTrackingSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-rowtrack").resolve("t").toString

  test("appends allocate dense disjoint ranges; _row_id is unique and dense") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create((1L to 10L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    GraftLake.append((11L to 25L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    GraftLake.append((26L to 30L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    val got = GraftLake.readWithRowIds(spark, p)
    // pre-tracking set reads NULL; the two tracked appends cover [0, 20)
    assert(got.filter(col("_row_id").isNull).count() == 10)
    val ids = got.filter(col("_row_id").isNotNull)
      .select(col("_row_id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 20L))
  }

  test("ids stable under DV mutations; fresh after copy-on-write rewrite") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create((1L to 1L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    GraftLake.append((2L to 21L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    val before = GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // MoR delete masks positions, never rewrites: survivors keep ids
    GraftLake.deleteDv(spark, p, expr("id % 4 = 0"))
    val after = GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet == before.keySet.filterNot(_ % 4 == 0))
    assert(after.forall { case (k, rid) => before(k) == rid })
    // compact materializes the masks and re-assigns FRESH ids (the
    // un-materialized Delta posture), still unique
    GraftLake.compact(spark, p, Seq("id"), 2, Some("id"))
    val post = GraftLake.readWithRowIds(spark, p)
    assert(post.filter(col("_row_id").isNull).count() == 0)
    val ids = post.select(col("_row_id")).collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    assert(ids.min >= 20L) // fresh range, never reused
  }

  test("racing writers never allocate overlapping ranges") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    Await.result(Future.sequence((1 to 4).map(w => Future {
      GraftLake.append(
        Seq.tabulate(50)(i => (w * 1000L + i, i.toLong)).toDF("id", "v"),
        p, Some("id"))
    })), 120.seconds)
    val ids = GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull)
      .select(col("_row_id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 200L), "ranges must be dense and disjoint")
  }

  test("the high-water mark rides checkpoints (no reuse after compact)") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    GraftLake.append((1L to 8L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    GraftLake.compact(spark, p, Seq("id"), 1, Some("id")) // re-assigns, hw grows
    GraftLake.checkpoint(p)
    GraftLake.append((9L to 10L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    val ids = GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull)
      .select(col("_row_id")).collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length, s"duplicate ids in ${ids.sorted.toSeq}")
  }

  test("read path serves bases from _ridmap sidecars: zero footer opens") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    GraftLake.append((1L to 40L).map(i => (i, i)).toDF("id", "v")
      .repartition(4), p, Some("id"))
    GraftLake.append((41L to 60L).map(i => (i, i)).toDF("id", "v"), p, Some("id"))
    val got = GraftLake.readWithRowIds(spark, p)
    val ids = got.filter(col("_row_id").isNotNull)
      .select(col("_row_id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 60L))
    // every tracked set carried its commit-time map — the driver never
    // re-opened a parquet footer at read time (the 100 TB posture)
    assert(GraftLake.lastRidFooterOpens == 0,
      s"expected sidecar-served bases, got ${GraftLake.lastRidFooterOpens} footer opens")
  }

  test("the positions read plans O(schemas) scans over many sets, DVs exact") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    (1 to 20).foreach(i => GraftLake.append(
      Seq((i.toLong, i.toLong)).toDF("id", "v"), p, Some("id")))
    val df = GraftLake.readWithRowIds(spark, p)
    // optimizedPlan (not executedPlan): AQE wraps the broadcast join
    // and hides physical scans from an outer collect
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1,
      s"21 same-schema sets must plan ONE scan relation, got ${scans.size}")
    // the bulk path re-derives each row's set identity from its file
    // path — DV masks must keep landing on exactly the right rows
    GraftLake.deleteDv(spark, p, expr("id % 3 = 0"))
    val after = GraftLake.readWithRowIds(spark, p)
    assert(after.filter(expr("id % 3 = 0")).count() == 0)
    assert(after.count() == 14)
    assert(after.filter(col("_row_id").isNotNull)
      .select(col("_row_id")).collect().map(_.getLong(0)).distinct.length == 14)
  }

  test("pre-sidecar sets fall back to the footer walk, same answer") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableRowTracking(p)
    GraftLake.append((1L to 30L).map(i => (i, i)).toDF("id", "v")
      .repartition(3), p, Some("id"))
    val before = GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(GraftLake.lastRidFooterOpens == 0)
    // simulate a set committed before the sidecar feature existed
    import scala.jdk.CollectionConverters._
    val maps = Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .filter(_.getFileName.toString == "_ridmap.json").toSeq
    assert(maps.nonEmpty)
    maps.foreach(Files.delete)
    val after = GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "fallback must serve identical ids")
    assert(GraftLake.lastRidFooterOpens >= 3,
      "legacy sets must be served by the footer walk")
  }

  test("SQL TBLPROPERTIES flips row tracking; one-way") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    graft.sources.LakeSql.register(spark, p, "rt_t", "id")
    spark.sql("ALTER TABLE rt_t SET TBLPROPERTIES ('enableRowTracking'='true')")
    assert(GraftLake.rowTrackingEnabled(p))
    spark.sql("INSERT INTO rt_t VALUES (1, 1)")
    assert(GraftLake.readWithRowIds(spark, p)
      .filter(col("_row_id").isNotNull).count() == 1)
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE rt_t SET TBLPROPERTIES ('enableRowTracking'='false')")
    }
    assert(err.getMessage.contains("one-way"))
    // SQL reads _row_id through the table_rowids TVF
    val rid = spark.sql(
      "SELECT _row_id FROM table_rowids('rt_t') WHERE id = 1").head
    assert(!rid.isNullAt(0) && rid.getLong(0) == 0L)
    graft.sources.LakeSql.unregister("rt_t")
  }
}
