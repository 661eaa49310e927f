package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, GraftLakeBatchSource}

/** DSv2 batch scan of the lake with manifest data skipping: Catalyst
  * pushes the query's filters/columns into the scan, the builder
  * prunes file-sets off the zone maps / blooms at PLAN time, and
  * every filter is re-applied post-scan (skipping is advisory).
  */
class LakeBatchScanSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-batchscan").resolve("t").toString

  /** Three 30-row sets keyed [1,30] [31,60] [61,90] with a date col. */
  private def seed(p: String): Unit = {
    import spark.implicits._
    val df = (1 to 90).map { i =>
      val yr = 1993 + (i - 1) / 30
      (i.toLong, s"t$i", i * 10L,
        java.sql.Date.valueOf(f"$yr-01-${(i - 1) % 28 + 1}%02d"))
    }.toDF("id", "tag", "v", "day")
    GraftLake.create(df.filter(col("id") <= 30), p,
      statsCols = Seq("id", "day"), bloomCols = Seq("id"))
    GraftLake.append(df.filter(col("id") > 30 && col("id") <= 60), p,
      statsCols = Seq("id", "day"), bloomCols = Seq("id"))
    GraftLake.append(df.filter(col("id") > 60), p,
      statsCols = Seq("id", "day"), bloomCols = Seq("id"))
  }

  test("pushed range filter prunes sets at plan time; results exact") {
    val p = fresh()
    seed(p)
    val df = spark.read.format("graftlake").load(p)
    assert(df.schema.fieldNames.toSeq == Seq("id", "tag", "v", "day"))
    val got = df.filter(col("id") > 60).agg(
      count(lit(1)), sum(col("v"))).head
    assert(got.getLong(0) == 30 && got.getLong(1) == (61 to 90).map(_ * 10L).sum)
    assert(GraftLakeBatchSource.lastScanSets == ((1, 2)),
      s"got ${GraftLakeBatchSource.lastScanSets}")
    // no filter: all sets scan (collect forces a real row scan —
    // a bare count() would legitimately answer from metadata now)
    assert(spark.read.format("graftlake").load(p).collect().length == 90)
    assert(GraftLakeBatchSource.lastScanSets == ((3, 0)))
  }

  test("date filter and IN list prune; filters still re-applied row-level") {
    val p = fresh()
    seed(p)
    val df = spark.read.format("graftlake").load(p)
    // dates in the middle set only
    val n = df.filter(col("day") >= lit(java.sql.Date.valueOf("1994-01-01")) &&
      col("day") < lit(java.sql.Date.valueOf("1995-01-01"))).count()
    assert(n == 30)
    assert(GraftLakeBatchSource.lastScanSets == ((1, 2)))
    // IN on the key: the value hull [5,65] overlaps every set's zone
    // map, but the middle set's BLOOM tests negative for both values
    // — the equality leg prunes what ranges cannot. Row filter still
    // applies inside the two opened sets.
    val rows = df.filter(col("id").isin(5L, 65L)).select(col("id"))
      .collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(5L, 65L))
    assert(GraftLakeBatchSource.lastScanSets == ((2, 1)))
  }

  test("column pruning reaches the parquet decoder") {
    val p = fresh()
    seed(p)
    GraftLakeBatchSource.readSchemas.clear()
    val s2 = spark.read.format("graftlake").load(p)
      .select(col("id"), col("v")).agg(sum(col("v"))).head.getLong(0)
    assert(s2 == (1 to 90).map(_ * 10L).sum)
    val seen = GraftLakeBatchSource.readSchemas.asScala.toSeq
    assert(seen.nonEmpty && seen.forall(cols =>
      !cols.contains("tag") && !cols.contains("day")),
      s"tag/day must be pruned from the read schema, saw $seen")
  }

  test("padd layouts plan hive subdirs with the constant partition value") {
    import spark.implicits._
    val p = fresh()
    val df = (1 to 40).map(i => (i.toLong, 1995 + i % 2, i * 3L))
      .toDF("id", "yr", "v")
    GraftLake.appendPartitioned(df, p, "yr", statsCols = Seq("id"))
    val got = spark.read.format("graftlake").load(p)
    assert(got.count() == 40)
    assert(got.filter(col("yr") === 1996).count() == 20)
    // the partition-value zone map prunes on yr (exact min==max)
    assert(GraftLakeBatchSource.lastScanSets == ((1, 1)))
  }

  test("schema evolution null-fills; renames refuse loudly; MoR is served") {
    import spark.implicits._
    val p = fresh()
    seed(p)
    GraftLake.addColumns(p, Seq("bonus" -> org.apache.spark.sql.types.LongType))
    val got = spark.read.format("graftlake").load(p)
    assert(got.schema.fieldNames.contains("bonus"))
    assert(got.filter(col("bonus").isNull).count() == 90)
    // outstanding DV sidecar: masked inside the per-file readers
    GraftLake.deleteDv(spark, p, expr("id = 7"))
    assert(spark.read.format("graftlake").load(p).count() == 89)
    // renames refuse
    val q = fresh()
    seed(q)
    GraftLake.renameColumn(q, "tag", "label")
    val err2 = intercept[Exception] {
      spark.read.format("graftlake").load(q).count()
    }
    assert(err2.getMessage.contains("rename"))
  }

  test("batch scan serves outstanding DVs + key tombstones exactly like the DataFrame read") {
    val p = fresh()
    seed(p)
    // Positional DVs across two sets, stacked over two commits.
    GraftLake.deleteDv(spark, p, col("id") % 7 === 0)          // 12 rows
    GraftLake.deleteDv(spark, p, col("id") === 33L)            // 1 more
    // Key tombstones (merge-on-read delete by key) on top.
    GraftLake.deleteMoR(spark, p, col("id").isin(2L, 61L), "id") // 2 more
    val api = GraftLake.read(spark, p)
    val dsv2 = spark.read.format("graftlake").load(p)
    assert(dsv2.count() == 90 - 15)
    assert(dsv2.collect().map(_.toSeq).toSet ==
      api.collect().map(_.toSeq).toSet)
    // Column pruning that drops the mask key column still masks: the
    // reader decodes the key internally, never emits it.
    val tags = dsv2.select(col("tag")).collect().map(_.getString(0)).toSet
    assert(!tags.contains("t2") && !tags.contains("t61") && !tags.contains("t7"))
    assert(tags.contains("t3"))
    // Pushed filters compose with the masks.
    assert(dsv2.filter(col("id") <= 10).count() == 8) // minus 2, 7
    // Metadata aggregates refuse while masks are outstanding.
    GraftLakeBatchSource.lastAggPushed = false
    assert(dsv2.agg(count(lit(1))).head.getLong(0) == 75L)
    assert(!GraftLakeBatchSource.lastAggPushed,
      "COUNT(*) must not serve from physical metadata under MoR masks")
    // Compact materializes; the scan serves the clean table again and
    // metadata aggregates resume.
    GraftLake.compact(spark, p, Seq("id"), numFiles = 2, Some("id"))
    GraftLakeBatchSource.lastAggPushed = false
    assert(spark.read.format("graftlake").load(p)
      .agg(count(lit(1))).head.getLong(0) == 75L)
    assert(GraftLakeBatchSource.lastAggPushed)
  }

  test("MIN/MAX/COUNT(*) answer from metadata alone — zero data tasks") {
    val p = fresh()
    seed(p)
    GraftLakeBatchSource.lastAggPushed = false
    val df = spark.read.format("graftlake").load(p)
    val r = df.agg(min(col("id")), max(col("day")), count(lit(1))).head
    assert(GraftLakeBatchSource.lastAggPushed, "aggregation must push down")
    assert(r.getLong(0) == 1L)
    assert(r.getDate(1).toString == "1995-01-28")
    assert(r.getLong(2) == 90L)
    // with a filter, aggregates must NOT push (rows need re-filtering)
    GraftLakeBatchSource.lastAggPushed = false
    val r2 = df.filter(col("id") > 60).agg(max(col("id"))).head
    assert(!GraftLakeBatchSource.lastAggPushed)
    assert(r2.getLong(0) == 90L)
    // non-prunable column: falls back to a real scan, same answer
    GraftLakeBatchSource.lastAggPushed = false
    val r3 = df.agg(max(col("tag"))).head
    assert(!GraftLakeBatchSource.lastAggPushed && r3.getString(0) == "t90")
  }

  test("GROUP BY partition columns answers from manifests — zero data tasks") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-groupagg")
      .resolve("t").toString
    val df0 = (0 until 120)
      .map(i => (i.toLong, (i % 4).toLong, i * 3L)).toDF("id", "bucket", "v")
    GraftLake.appendPartitionedBy(df0, p, Seq("bucket"), statsCols = Seq("id"))
    GraftLake.setPartitionColumns(p, Seq("bucket"))
    GraftLakeBatchSource.lastAggPushed = false
    val lake = spark.read.format("graftlake").load(p)
    val got = lake.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"))
      .orderBy(col("bucket")).collect()
    assert(GraftLakeBatchSource.lastAggPushed,
      "grouped aggregation over pinned layout columns must push down")
    assert(got.length == 4)
    got.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == 30L)
      assert(r.getLong(2) == b) // min id in bucket b is b itself
      assert(r.getLong(3) == 116L + b)
    }
    // grouping by a NON-pinned column must not push — real scan,
    // same answers
    GraftLakeBatchSource.lastAggPushed = false
    val byV = lake.groupBy(col("v")).agg(count(lit(1))).collect()
    assert(!GraftLakeBatchSource.lastAggPushed)
    assert(byV.length == 120)
  }

  /** One hive-partitioned table: 120 rows, bucket = id % 4, ids 0-119. */
  private def partitioned(): String = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-filteragg")
      .resolve("t").toString
    val df0 = (0 until 120)
      .map(i => (i.toLong, (i % 4).toLong, i * 3L)).toDF("id", "bucket", "v")
    GraftLake.appendPartitionedBy(df0, p, Seq("bucket"), statsCols = Seq("id"))
    GraftLake.setPartitionColumns(p, Seq("bucket"))
    p
  }

  test("layout-column filters compose with grouped-agg pushdown — zero data tasks") {
    val p = partitioned()
    val lake = spark.read.format("graftlake").load(p)
    // WHERE bucket >= 2 GROUP BY bucket: the filter is exactly
    // decidable per pinned hive set, so it is CONSUMED and the
    // surviving groups answer from manifests/footers.
    GraftLakeBatchSource.lastAggPushed = false
    val got = lake.filter(col("bucket") >= 2)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"))
      .orderBy(col("bucket")).collect()
    assert(GraftLakeBatchSource.lastAggPushed,
      "filtered grouped aggregation over pinned layout columns must push")
    assert(GraftLakeBatchSource.lastScanSets._1 == 0, "zero data tasks")
    assert(GraftLakeBatchSource.lastConsumed.nonEmpty)
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    got.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == 30L && r.getLong(2) == b && r.getLong(3) == 116L + b)
    }
    // IN with a GAP: zone-map ranges alone would over-keep bucket 2 —
    // the exact evaluator must not.
    GraftLakeBatchSource.lastAggPushed = false
    val in = lake.filter(col("bucket").isin(1L, 3L))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket")).collect()
    assert(GraftLakeBatchSource.lastAggPushed)
    assert(in.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 30L), (3L, 30L)))
    // Ungrouped filtered aggregate: same composition.
    GraftLakeBatchSource.lastAggPushed = false
    val r = lake.filter(col("bucket") === 2).agg(
      count(lit(1)), min(col("id")), max(col("id"))).head
    assert(GraftLakeBatchSource.lastAggPushed)
    assert(r.getLong(0) == 30L && r.getLong(1) == 2L && r.getLong(2) == 118L)
    // A filter the layout cannot decide (non-layout column) keeps the
    // conservative path: aggregate NOT pushed, answers identical.
    GraftLakeBatchSource.lastAggPushed = false
    val mixed = lake.filter(col("bucket") >= 2 && col("v") > 100)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket")).collect()
    assert(!GraftLakeBatchSource.lastAggPushed)
    // v = 3i > 100 → i ≥ 34: 22 qualifying rows in each of buckets 2, 3
    assert(mixed.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 22L), (3L, 22L)))
  }

  test("consumed layout filters stay exact on the fallback data scan") {
    val p = partitioned()
    val lake = spark.read.format("graftlake").load(p)
    // No aggregate: the data scan itself must apply the consumed
    // filter exactly (Spark plans no re-apply for consumed filters).
    val rows = lake.filter(col("bucket").isin(0L, 3L))
      .select(col("id"), col("bucket")).collect()
    assert(GraftLakeBatchSource.lastConsumed.nonEmpty)
    assert(rows.length == 60)
    assert(rows.forall(r => r.getLong(1) == 0L || r.getLong(1) == 3L))
    assert(rows.map(_.getLong(0)).toSet ==
      (0 until 120).filter(i => i % 4 == 0 || i % 4 == 3).map(_.toLong).toSet)
    // Mixed consumed + residual: residual re-applied by Spark, rows exact.
    val rows2 = lake.filter(col("bucket") === 1L && col("v") <= 30)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(rows2 == Set(1L, 5L, 9L))
  }

  test("metadata COUNT(*) serves _ridmap sidecars: zero footer opens; legacy sets fall back") {
    val p = fresh()
    seed(p)
    val lake = spark.read.format("graftlake").load(p)
    GraftLakeBatchSource.lastAggPushed = false
    GraftLakeBatchSource.lastCountFooterOpens = 7
    assert(lake.agg(count(lit(1))).head.getLong(0) == 90L)
    assert(GraftLakeBatchSource.lastAggPushed)
    assert(GraftLakeBatchSource.lastCountFooterOpens == 0,
      "post-sidecar sets must answer COUNT(*) without opening footers")
    // DESCRIBE DETAIL num_rows rides the same sidecars.
    graft.sources.LakeSql.register(spark, p, "detail_rows_t", "id")
    val det = spark.sql("DESCRIBE DETAIL detail_rows_t").head
    assert(det.getLong(det.fieldIndex("num_rows")) == 90L)
    // A legacy set (sidecar removed) falls back to its footer walk —
    // same answer, non-zero fallback count.
    val firstSet = GraftLake.snapshot(p).live.head.set
    Files.delete(java.nio.file.Paths.get(p, firstSet, "_ridmap.json"))
    GraftLakeBatchSource.lastAggPushed = false
    assert(spark.read.format("graftlake").load(p)
      .agg(count(lit(1))).head.getLong(0) == 90L)
    assert(GraftLakeBatchSource.lastAggPushed)
    assert(GraftLakeBatchSource.lastCountFooterOpens == 1)
    assert(spark.sql("DESCRIBE DETAIL detail_rows_t").head
      .isNullAt(det.fieldIndex("num_rows")))
  }

  test("SUM/COUNT(col)/AVG serve per-set stats — decline on distinct/stat-less/legacy") {
    import scala.jdk.CollectionConverters._
    val p = fresh()
    seed(p)
    val df = spark.read.format("graftlake").load(p)
    GraftLakeBatchSource.lastAggPushed = false
    val r = df.agg(sum(col("id")), count(lit(1))).head
    assert(GraftLakeBatchSource.lastAggPushed, "SUM must serve from manifests")
    assert(r.getLong(0) == 4095L && r.getLong(1) == 90L)
    // COUNT(col) serves the recorded non-null counts; AVG completes
    // from the (sum, count) pair Spark splits it into
    GraftLakeBatchSource.lastAggPushed = false
    val rc = df.agg(count(col("id")), avg(col("id"))).head
    assert(GraftLakeBatchSource.lastAggPushed,
      "COUNT(col)/AVG must serve from manifests")
    assert(rc.getLong(0) == 90L && rc.getDouble(1) == 4095.0 / 90.0)
    // column without recorded stats: real scan, same answer
    GraftLakeBatchSource.lastAggPushed = false
    val r2 = df.agg(sum(col("v"))).head
    assert(!GraftLakeBatchSource.lastAggPushed && r2.getLong(0) == 40950L)
    // SUM(DISTINCT) can never fold from per-set sums
    GraftLakeBatchSource.lastAggPushed = false
    val r3 = df.agg(sum_distinct(col("id"))).head
    assert(!GraftLakeBatchSource.lastAggPushed && r3.getLong(0) == 4095L)
    // LEGACY pre-sum log entries: strip every `"sum":` field and
    // re-seal the crc — min/max/count still serve, a SUM in the mix
    // declines the WHOLE pushdown to the exact real scan.
    val logDir = java.nio.file.Paths.get(p, "_graft_log")
    Files.list(logDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json")).foreach { f =>
        val lines = Files.readString(f).split("\n").map { line =>
          val body0 = line.substring(0, line.lastIndexOf(""","crc":"""))
          val body = body0.replaceAll(""","sum":-?\d+""", "")
            .replaceAll(""","nn":\d+""", "")
          val c = new java.util.zip.CRC32()
          c.update(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          body + s""","crc":${c.getValue}}"""
        }
        Files.writeString(f, lines.mkString("\n"))
      }
    assert(GraftLake.snapshot(p).live.forall(_.statsFor("id").exists(_.sum.isEmpty)))
    GraftLakeBatchSource.lastAggPushed = false
    val r4 = df.agg(sum(col("id")), min(col("id")), count(lit(1))).head
    assert(!GraftLakeBatchSource.lastAggPushed,
      "a sum-less live set must decline the pushdown")
    assert(r4.getLong(0) == 4095L && r4.getLong(1) == 1L && r4.getLong(2) == 90L)
    // min/max/count alone still serve on the legacy log
    GraftLakeBatchSource.lastAggPushed = false
    val r5 = df.agg(min(col("id")), count(lit(1))).head
    assert(GraftLakeBatchSource.lastAggPushed)
    assert(r5.getLong(0) == 1L && r5.getLong(1) == 90L)
  }

  test("MoR masks on hive-layout columns reach the batch reader via the dir constants") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-hivemask")
      .resolve("t").toString
    val df0 = (0 until 80)
      .map(i => (i.toLong, (i % 4).toLong, i * 2L)).toDF("id", "bucket", "v")
    GraftLake.appendPartitionedBy(df0, p, Seq("bucket"), statsCols = Seq("id"))
    GraftLake.setPartitionColumns(p, Seq("bucket"))
    // key tombstone ON THE LAYOUT COLUMN: its value lives in the hive
    // directory name, not the parquet bytes — the reader must test the
    // per-partition constant, not silently drop the mask
    GraftLake.deleteMoR(spark, p, col("bucket") === 2L, "bucket")
    // plus a positional DV inside a hive set
    GraftLake.deleteDv(spark, p, col("id") === 1L)
    val cols = Seq(col("id"), col("bucket"), col("v"))
    val api = GraftLake.read(spark, p).select(cols: _*)
    val dsv2 = spark.read.format("graftlake").load(p).select(cols: _*)
    assert(api.count() == 59) // 80 - 20 (bucket 2) - 1 (id 1)
    assert(dsv2.count() == 59)
    assert(dsv2.collect().map(_.toSeq).toSet ==
      api.collect().map(_.toSeq).toSet)
    // pruning the layout column away still masks
    assert(dsv2.select(col("id")).collect().map(_.getLong(0)).toSet ==
      (0 until 80).filter(i => i % 4 != 2 && i != 1).map(_.toLong).toSet)
  }

  test("runtime filters from a broadcast join's build side prune sets at execution") {
    import spark.implicits._
    val p = fresh()
    seed(p)
    GraftLakeBatchSource.lastRuntimePrune.remove(p)
    val fact = spark.read.format("graftlake").load(p)
    // the dim is FILE-backed so its selective filter survives as a
    // real Filter node (a local Seq constant-folds it away and the
    // DPP heuristic then sees nothing selective), and the filter is
    // on a NON-join column — a join-key predicate would propagate
    // transitively and prune the fact STATICALLY, leaving DPP nothing
    // to do. The m==0 keys all land inside the third set [61, 90].
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    (1 to 90).map(i =>
        (i.toLong, if (i > 60 && i % 9 == 0) 0 else 1)).toDF("id", "m")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("m") === 0)
    val j = fact.join(broadcast(dim), Seq("id"))
    assert(j.count() == 4) // ids 63, 72, 81, 90
    val pruned = GraftLakeBatchSource.lastRuntimePrune.get(p)
    assert(pruned != null, "runtime filter must reach the scan")
    assert(pruned == ((1, 2)),
      s"dim keys live in one set; expected (1, 2), got $pruned")
  }

  test("metadata statistics auto-broadcast a small lake dim without a hint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stats")
    val fact = base.resolve("fact").toString
    val dim = base.resolve("dim").toString
    GraftLake.create((1 to 5000).map(i => (i.toLong, i % 40L, i * 2L))
      .toDF("id", "k", "v"), fact, statsCols = Seq("id"))
    GraftLake.create((0 until 40).map(i => (i.toLong, s"g$i"))
      .toDF("k", "name"), dim, statsCols = Seq("k"))
    // NO broadcast() hint: the scan's estimateStatistics (sidecar
    // rows + file bytes) must size the dim under the auto-broadcast
    // threshold — without SupportsReportStatistics a DSv2 relation
    // sizes at defaultSizeInBytes and never broadcasts.
    val j = spark.read.format("graftlake").load(fact)
      .join(spark.read.format("graftlake").load(dim), Seq("k"))
    assert(j.count() == 5000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small lake dim must auto-broadcast off metadata stats:\n$plan")
  }

  test("stats kill-switch: with stats.enabled=false the same join must NOT broadcast") {
    import spark.implicits._
    val fact = fresh(); val dim = fresh()
    GraftLake.create((1 to 5000).map(i => (i.toLong, i % 40L, i * 2L))
      .toDF("id", "k", "v"), fact, statsCols = Seq("id"))
    GraftLake.create((0 until 40).map(i => (i.toLong, s"g$i"))
      .toDF("k", "name"), dim, statsCols = Seq("k"))
    def plan(): String = spark.read.format("graftlake").load(fact)
      .join(spark.read.format("graftlake").load(dim), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan().contains("BroadcastHashJoin"))
    try {
      spark.conf.set("spark.graft.lake.stats.enabled", "false")
      // stats-less DSv2 sizes at defaultSizeInBytes — the broadcast
      // decision must flip, proving the reported stats drive it
      assert(!plan().contains("BroadcastHashJoin"),
        "kill-switched stats must fall back to the no-broadcast default")
    } finally spark.conf.unset("spark.graft.lake.stats.enabled")
    assert(plan().contains("BroadcastHashJoin"))
  }

  test("column statistics serve the CBO from manifests: exact min/max/nullCount") {
    import scala.jdk.CollectionConverters._
    val p = fresh()
    seed(p)
    val prov = new graft.sources.GraftLakeBatchSource
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("path" -> p).asJava)
    val table = prov.getTable(prov.inferSchema(opts), Array.empty,
      Map("path" -> p).asJava)
    val scan = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(opts).build()
    val st = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.numRows().getAsLong == 90L)
    val cols = st.columnStats().asScala.map { case (k, v) => k.toString -> v }
    // `id` is a statted integral column: exact min/max/nullCount
    val idStats = cols("id")
    assert(idStats.min().get() == 1L && idStats.max().get() == 90L)
    assert(idStats.nullCount().getAsLong == 0L)
    // `day` is statted but temporal: its image is not served as a
    // value; the nullCount still is
    val dayStats = cols("day")
    assert(!dayStats.min().isPresent && dayStats.nullCount().getAsLong == 0L)
    // `v` records no stats: no column entry at all
    assert(!cols.contains("v"))
  }

  test("flat tables consume nothing: every pushed filter stays residual") {
    val p = fresh()
    seed(p)
    val lake = spark.read.format("graftlake").load(p)
    GraftLakeBatchSource.lastConsumed = Seq("sentinel")
    assert(lake.filter(col("id") > 60).count() == 30)
    assert(GraftLakeBatchSource.lastConsumed.isEmpty,
      "a flat (non-hive) table must not consume filters: pinned zone " +
        "maps ignore NULLs, so whole-set keep/drop is not exact there")
  }
}
