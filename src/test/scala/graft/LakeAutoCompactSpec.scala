package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** Auto-compaction: opted-in tables keep their live-set count bounded
  * after data-growing commits — the continuous-ingest answer to
  * one-set-per-micro-batch growth.
  */
class LakeAutoCompactSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-autocompact").resolve("t").toString

  test("appends keep live sets bounded; content exact; toggle works") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((1L, 1L)).toDF("id", "v"), p, Some("id"))
    GraftLake.enableAutoCompact(p, maxLiveSets = 3)
    (2 to 10).foreach(i => GraftLake.append(
      Seq((i.toLong, i.toLong)).toDF("id", "v"), p, Some("id")))
    val s = GraftLake.snapshot(p)
    assert(s.live.size <= 4, s"live sets ${s.live.size} must stay bounded")
    assert(GraftLake.read(spark, p).agg(sum(col("v"))).head.getLong(0) == 55L)
    // stats survive the auto-compacts
    assert(s.live.forall(_.statsFor("id").isDefined))
    // disable: growth resumes unbounded
    GraftLake.disableAutoCompact(p)
    val n0 = GraftLake.snapshot(p).live.size
    (11 to 16).foreach(i => GraftLake.append(
      Seq((i.toLong, i.toLong)).toDF("id", "v"), p, Some("id")))
    assert(GraftLake.snapshot(p).live.size == n0 + 6)
  }

  test("a failed auto-compact leaves a trace; the commit still succeeds") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((1L, 1L)).toDF("id", "v"), p, Some("id"))
    (2 to 5).foreach(i => GraftLake.append(
      Seq((i.toLong, i.toLong)).toDF("id", "v"), p, Some("id")))
    // Break compaction: a live set's files vanish out from under the
    // log (simulated external data loss) — compact's read must fail.
    import scala.jdk.CollectionConverters._
    val victim = java.nio.file.Paths.get(p, GraftLake.snapshot(p).live.head.set)
    Files.walk(victim).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    GraftLake.enableAutoCompact(p, maxLiveSets = 2)
    GraftLake.lastAutoCompactError.set(None)
    val v = GraftLake.append(Seq((6L, 6L)).toDF("id", "v"), p, Some("id"))
    // best-effort: the append COMMITTED even though the hook failed...
    assert(GraftLake.latestVersion(p) == v)
    // ...and the failure is traceable, not swallowed without witness
    assert(GraftLake.lastAutoCompactError.get().isDefined,
      "a failed auto-compact round must leave a trace")
  }

  test("SQL TBLPROPERTIES flips it; streaming sink epochs stay bounded") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((0L, 0L)).toDF("id", "v"), p, Some("id"))
    LakeSql.register(spark, p, "ac_t", "id")
    spark.sql("ALTER TABLE ac_t SET TBLPROPERTIES ('autoCompact'='3')")
    assert(GraftLake.autoCompactThreshold(p).contains(3))
    // the DSv2 sink path: one epoch per batch through the lake sink
    val inDir = Files.createTempDirectory("ac-in").toString
    (1 to 8).foreach { i =>
      Seq((i.toLong, i.toLong)).toDF("id", "v")
        .write.mode("append").parquet(inDir)
    }
    val q = spark.readStream.schema("id BIGINT, v BIGINT").parquet(inDir)
      .writeStream.format("graft-lake")
      .option("path", p)
      .option("checkpointLocation",
        Files.createTempDirectory("ac-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(GraftLake.snapshot(p).live.size <= 4)
    assert(GraftLake.read(spark, p).agg(sum(col("v"))).head.getLong(0) == 36L)
    spark.sql("ALTER TABLE ac_t SET TBLPROPERTIES ('autoCompact'='false')")
    assert(GraftLake.autoCompactThreshold(p).isEmpty)
    LakeSql.unregister("ac_t")
  }

  test("lake source drains under Trigger.AvailableNow and stops") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(Seq((1L, 10L)).toDF("id", "v"), p, Some("id"))
    (2 to 6).foreach(i => GraftLake.append(
      Seq((i.toLong, i * 10L)).toDF("id", "v"), p, Some("id")))
    val outDir = Files.createTempDirectory("an-out").toString
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", p).option("maxCommitsPerTrigger", "2").load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation",
        Files.createTempDirectory("an-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow query must terminate after draining")
    val got = spark.read.parquet(outDir)
    assert(got.count() == 6)
    assert(got.agg(sum(col("v"))).head.getLong(0) == 210L)
  }
}
