package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Multi-column PARTITIONED BY: a (c1, c2) layout tuple — one file-set
  * per value combination with exact min==max manifests on EVERY layout
  * column, so equality on any of them (prefix or not) prunes at the
  * manifest; the sealed layout marker records the tuple in order and
  * rides checkpoints and clones; dynamic overwrite replaces exactly
  * the incoming tuples.
  */
class LakeMultiPartitionSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-mpart").resolve("t").toString

  /** 24 rows over (yr in 1..3, q in 1..4): 12 value tuples, 2 rows
    * each.
    */
  private def seed(p: String): Unit = {
    import spark.implicits._
    val df = (0 until 24).map { i =>
      (i.toLong, (i % 3 + 1).toLong, (i % 4 + 1).toLong, i * 10L)
    }.toDF("id", "yr", "q", "v")
    GraftLake.appendPartitionedBy(df, p, Seq("yr", "q"),
      statsCols = Seq("id"))
    GraftLake.setPartitionColumns(p, Seq("yr", "q"))
  }

  test("one set per value tuple, exact manifests on both columns; read reconstructs") {
    val p = fresh()
    seed(p)
    val live = GraftLake.snapshot(p).live
    assert(live.size == 12, s"expected 12 tuple sets, got ${live.size}")
    assert(live.forall(ls =>
      ls.statsFor("yr").exists(st => st.min == st.max) &&
        ls.statsFor("q").exists(st => st.min == st.max) &&
        ls.statsFor("id").isDefined))
    // the hive dirs carry the values; read re-derives both columns
    val got = GraftLake.read(spark, p)
    assert(got.count() == 24)
    assert(got.filter(col("yr") === 2L && col("q") === 3L).count() == 2)
    assert(got.agg(sum(col("v"))).head.getLong(0) == (0 until 24).map(_ * 10L).sum)
  }

  test("the layout marker records the tuple in order; relayout refuses; clone keeps it") {
    val p = fresh()
    seed(p)
    assert(GraftLake.partitionColumnsOf(p) == Seq("yr", "q"))
    // single-column consumers must NOT see a tuple's head as the layout
    assert(GraftLake.partitionColumnOf(p).isEmpty)
    assert(GraftLake.setPartitionColumns(p, Seq("yr", "q")) ==
      GraftLake.latestVersion(p)) // idempotent
    val err = intercept[IllegalArgumentException] {
      GraftLake.setPartitionColumns(p, Seq("q", "yr"))
    }
    assert(err.getMessage.contains("already partitioned"))
    // rides checkpoints
    GraftLake.checkpoint(p)
    assert(GraftLake.partitionColumnsOf(p) == Seq("yr", "q"))
    // forks into shallow clones
    val dst = Files.createTempDirectory("graft-mpart-clone").resolve("c").toString
    GraftLake.shallowClone(p, dst)
    assert(GraftLake.partitionColumnsOf(dst) == Seq("yr", "q"))
  }

  test("equality on the NON-PREFIX layout column prunes mutations") {
    val p = fresh()
    seed(p)
    GraftLake.enableDeletionVectors(p)
    // q = 4 pins 3 of the 12 sets; yr is unconstrained — hive prefix
    // pruning could not skip here, per-column zone maps do
    GraftLake.deleteDv(spark, p, expr("q = 4 AND v >= 0"))
    assert(GraftLake.lastDvScanSets == ((3, 9)),
      s"expected 3 scanned / 9 skipped, got ${GraftLake.lastDvScanSets}")
    assert(GraftLake.read(spark, p).filter(col("q") === 4L).count() == 0)
    assert(GraftLake.read(spark, p).count() == 18)
  }

  test("dynamic overwrite replaces exactly the incoming value tuples") {
    import spark.implicits._
    val p = fresh()
    seed(p)
    val before = GraftLake.snapshot(p).live
    val upd = Seq((100L, 2L, 3L, 9999L), (101L, 2L, 3L, 8888L))
      .toDF("id", "yr", "q", "v")
    val (_, replacedN, keptN) =
      GraftLake.overwritePartitionsDynamic(spark, upd, p, Seq("id"))
    assert(replacedN == 1 && keptN == 11)
    val got = GraftLake.read(spark, p)
    assert(got.filter(col("yr") === 2L && col("q") === 3L)
      .select(col("v")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(8888L, 9999L))
    assert(got.count() == 24) // 22 kept + 2 new
    // untouched tuples survive BY REFERENCE (same set names)
    val after = GraftLake.snapshot(p).live.map(_.set).toSet
    val untouched = before.filterNot(ls =>
      ls.statsFor("yr").exists(_.min == 2L) &&
        ls.statsFor("q").exists(_.min == 3L)).map(_.set).toSet
    assert(untouched.subsetOf(after))
  }

  test("a multi-column padd commit streams with both values served as constants") {
    val p = fresh()
    seed(p)
    val base = Files.createTempDirectory("graft-mpart-stream")
    val out = base.resolve("out").toString
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", p).load()
      .writeStream.option("checkpointLocation", base.resolve("ck").toString)
      .format("parquet").option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() == 24)
    assert(got.filter(col("yr") === 3L && col("q") === 2L).count() == 2)
    assert(got.select(sum(col("yr")), sum(col("q"))).head ==
      org.apache.spark.sql.Row((0 until 24).map(i => (i % 3 + 1).toLong).sum,
        (0 until 24).map(i => (i % 4 + 1).toLong).sum))
  }
}
