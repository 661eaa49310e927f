package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** The DSv2 `graft-lake` WRITE connector: batch append, streaming
  * exactly-once epochs, type round-trip fidelity, and composition with
  * the rest of the lake surface (the staged-file commit is the same
  * log entry any other writer publishes).
  */
class LakeSinkSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-lakesink").resolve("t").toString

  test("batch write.format(graft-lake) appends atomic commits readable by GraftLake.read") {
    val path = freshTable()
    val orders = Tables.orders(spark, sf).limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    orders.write.format("graft-lake").option("path", path).mode("append").save()
    assert(GraftLake.read(spark, path).count() == 100)
    orders.write.format("graft-lake").option("path", path).mode("append").save()
    val cs = GraftLake.commits(path)
    assert(cs.size == 2 && cs.forall(_.action == "append"))
    assert(GraftLake.read(spark, path).count() == 200)
    // Value-exact round-trip through the executor-side parquet writer.
    val got = GraftLake.readAt(spark, path, 0)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val want = orders.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(got == want)
    // Nothing staged survives a successful commit cycle's publish.
    val staged = java.nio.file.Paths.get(path, "_staging")
    import scala.jdk.CollectionConverters._
    assert(!Files.exists(staged) ||
      Files.list(staged).iterator().asScala.isEmpty)
  }

  test("streaming writeStream.format(graft-lake): per-epoch tagged commits, exactly-once on replay") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = freshTable()
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("id", "payload")
      .writeStream.format("graft-lake").option("path", path)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-lakesink-ck").toString)
      .start()
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(GraftLake.read(spark, path).count() == 3)
    val cs = GraftLake.commits(path)
    assert(cs.nonEmpty && cs.forall(_.tag.exists(
      _.startsWith("graft-lake-sink-epoch-"))),
      "every streaming commit must carry its epoch tag")
    // Replay simulation: re-committing an epoch's tag must be a no-op
    // that discards the replayed staging files (Spark re-runs a failed
    // epoch with the same id).
    val replayTag = cs.head.tag.get
    val staged = java.nio.file.Paths.get(path, "_staging", "replay.parquet")
    Files.createDirectories(staged.getParent)
    Files.writeString(staged, "replayed bytes")
    val verBefore = GraftLake.latestVersion(path)
    val v = GraftLake.commitStagedFiles(path, Seq(staged.toString),
      GraftLake.read(spark, path).schema, Some(replayTag))
    assert(v == cs.head.version, "replay must return the original version")
    assert(GraftLake.latestVersion(path) == verBefore, "replay must not commit")
    assert(!Files.exists(staged), "replayed staging files must be discarded")
    assert(GraftLake.read(spark, path).count() == 3)
  }

  test("sink round-trips every supported primitive type bit-exactly") {
    val session = spark
    import session.implicits._
    val path = freshTable()
    val df = Seq(
      (1L, 7, 2.5d, 1.5f, true, "héllo", "2024-03-01", "2024-03-01T12:34:56.789"),
      (2L, -3, -0.125d, -2.25f, false, "", "1969-12-31", "1970-01-01T00:00:00.000"))
      .toDF("l", "i", "d", "f", "b", "s", "dt", "ts")
      .withColumn("dt", to_date(col("dt")))
      .withColumn("ts", to_timestamp(col("ts")))
    df.write.format("graft-lake").option("path", path).mode("append").save()
    val got = GraftLake.read(spark, path).orderBy("l")
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(got.collect().map(_.toSeq).toSeq ==
      df.orderBy("l").collect().map(_.toSeq).toSeq)
    // NULLs in every column survive too.
    val nulls = df.limit(1).select(df.columns.map(c =>
      lit(null).cast(df.schema(c).dataType).as(c)): _*)
    nulls.write.format("graft-lake").option("path", path).mode("append").save()
    val lastRow = GraftLake.read(spark, path)
      .filter(col("l").isNull).collect()
    assert(lastRow.length == 1 && lastRow.head.toSeq.forall(_ == null))
  }

  test("sink commits compose with the lake surface: compact, time travel, stream read") {
    val path = freshTable()
    val orders = Tables.orders(spark, sf).limit(50)
      .select(col("o_orderkey"), col("o_totalprice"))
    orders.write.format("graft-lake").option("path", path).mode("append").save()
    orders.write.format("graft-lake").option("path", path).mode("append").save()
    val v = GraftLake.compact(spark, path, Seq("o_orderkey"), numFiles = 2)
    assert(v == 2)
    assert(GraftLake.read(spark, path).count() == 100)
    assert(GraftLake.readAt(spark, path, 0).count() == 50)
  }

  test("sink statsCols: writers stream min/max and readPruned skips sink-written sets") {
    val path = freshTable()
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
    // Two disjoint key ranges, two sink commits, stats streamed by the
    // writers (no post-write scan).
    o.filter(col("o_orderkey") < 500)
      .write.format("graft-lake").option("path", path)
      .option("statsCols", "o_orderkey").mode("append").save()
    o.filter(col("o_orderkey") >= 500)
      .write.format("graft-lake").option("path", path)
      .option("statsCols", "o_orderkey").mode("append").save()
    val cs = GraftLake.commits(path)
    assert(cs.forall(_.stats.exists(_.col == "o_orderkey")),
      s"sink commits must carry streamed stats: ${cs.map(_.stats)}")
    assert(cs(0).stats.find(_.col == "o_orderkey").get.max < 500)
    assert(cs(1).stats.find(_.col == "o_orderkey").get.min >= 500)
    val (df, scanned, skipped) = GraftLake.readPruned(
      spark, path, Seq(("o_orderkey", 0L, 100L)))
    assert(scanned == 1 && skipped == 1, "zone maps must prune the other set")
    assert(df.filter(col("o_orderkey") <= 100).count() ==
      o.filter(col("o_orderkey") <= 100).count())
    // A non-integral stats column is rejected up front.
    val err = intercept[Exception] {
      o.write.format("graft-lake").option("path", freshTable())
        .option("statsCols", "o_orderstatus").mode("append").save()
    }
    assert(err.getMessage.contains("integral") ||
      Option(err.getCause).exists(_.getMessage.contains("integral")))
  }

  test("compact re-records bloom sidecars so point skipping survives maintenance") {
    val path = freshTable()
    val o = Tables.orders(spark, sf).select(col("o_orderkey"))
    GraftLake.create(o.filter(pmod(col("o_orderkey"), lit(2)) === 0), path,
      bloomCols = Seq("o_orderkey"))
    GraftLake.append(o.filter(pmod(col("o_orderkey"), lit(2)) === 1), path,
      bloomCols = Seq("o_orderkey"))
    GraftLake.compact(spark, path, Seq("o_orderkey"), numFiles = 2)
    // The compacted set has ONE live set; a point lookup must still be
    // served by a verified bloom (scanned=1, not conservative).
    val (df, scanned, skipped) = GraftLake.readPoint(
      spark, path, "o_orderkey", 77L)
    assert(scanned + skipped == 1)
    assert(scanned == 1)
    assert(df.filter(col("o_orderkey") === 77).count() == 1)
    // An absent key is pruned by the re-recorded bloom: zero sets open.
    val (_, missScan, _) = GraftLake.readPoint(
      spark, path, "o_orderkey", 99999999L)
    assert(missScan == 0, "compacted set must carry a fresh bloom")
  }
}
