package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Storage-partitioned joins: two lake tables laid out by the same
  * key report KeyGroupedPartitioning (one input partition per value
  * tuple, HasPartitionKey) and join WITHOUT a shuffle under
  * `spark.sql.sources.v2.bucketing.enabled` — Spark's SPJ, the DSv2
  * answer to bucketed joins. With the conf off, the scan keeps
  * per-file parallelism and reports nothing.
  */
class LakeSpjSpec extends AnyFunSuite with SparkSpec {

  private def mk(base: java.nio.file.Path, name: String, rows: Int): String = {
    import spark.implicits._
    val p = base.resolve(name).toString
    val df = (0 until rows)
      .map(i => (i.toLong, (i % 4).toLong, i * 10L))
      .toDF("id", "bucket", "v")
    GraftLake.appendPartitionedBy(df, p, Seq("bucket"))
    GraftLake.setPartitionColumns(p, Seq("bucket"))
    p
  }

  test("same-layout tables join with zero exchanges; content exact") {
    val base = Files.createTempDirectory("graft-spj")
    val p1 = mk(base, "a", 40)
    val p2 = mk(base, "b", 24)
    val prevBucketing =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBroadcast =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = spark.read.format("graftlake").load(p1)
        .select(col("bucket"), col("v").as("va"))
      val b = spark.read.format("graftlake").load(p2)
        .select(col("bucket"), col("v").as("vb"))
      val j = a.join(b, Seq("bucket"))
      val got = j.agg(count(lit(1)), sum(col("va") + col("vb"))).head
      // ground truth: per-bucket 10x6 pairs
      assert(got.getLong(0) == 4L * 10 * 6)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-partitioned lake join must not shuffle:\n$plan")
    } finally {
      prevBucketing.fold(
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      prevBroadcast.fold(
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  test("group-by over the layout key aggregates without an exchange too") {
    val base = Files.createTempDirectory("graft-spj-agg")
    val p1 = mk(base, "a", 40)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val df = spark.read.format("graftlake").load(p1)
      // sum(v) is not metadata-answerable, so this is a REAL per-task
      // aggregation — but the key-grouped partitioning satisfies the
      // clustered distribution, so no shuffle is needed
      val g = df.groupBy(col("bucket")).agg(sum(col("v")).as("s"))
      val rows = g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows.keySet == Set(0L, 1L, 2L, 3L))
      assert(rows(0L) == (0 until 40 by 4).map(_ * 10L).sum)
      val plan = g.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"key-grouped aggregation must not shuffle:\n$plan")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
    }
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("boundary: one unpinned side degrades to a correct full-shuffle join") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-spj-unpinned")
    val p1 = mk(base, "a", 40)
    // b gets the layout, then a FLAT append lands spanning all bucket
    // values — its set is unpinned, so the scan must report nothing
    // and the join must fall back to a (correct) shuffled plan.
    val p2 = mk(base, "b", 24)
    GraftLake.append((100 until 108)
      .map(i => (i.toLong, (i % 4).toLong, i * 10L))
      .toDF("id", "bucket", "v"), p2)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graftlake").load(p1)
        .select(col("bucket"), col("v").as("va"))
      val b = spark.read.format("graftlake").load(p2)
        .select(col("bucket"), col("v").as("vb"))
      val j = a.join(b, Seq("bucket"))
      assert(j.count() == 4L * 10 * (6 + 2))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        "an unpinned side cannot satisfy KeyGroupedPartitioning — " +
          s"the silent fallback is a shuffled join:\n$plan")
    }
  }

  test("boundary: partially-clustered distribution splits the skewed side per file") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-spj-skew")
    // a: 8 files per bucket value (skew-shaped); b: small per bucket.
    val pa = base.resolve("a").toString
    GraftLake.appendPartitionedBy(
      (0 until 400).map(i => (i.toLong, (i % 4).toLong, i * 10L))
        .toDF("id", "bucket", "v").repartition(8),
      pa, Seq("bucket"))
    GraftLake.setPartitionColumns(pa, Seq("bucket"))
    val pb = mk(base, "b", 24)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graftlake").load(pa)
        .select(col("bucket"), col("v").as("va"))
      val b = spark.read.format("graftlake").load(pb)
        .select(col("bucket"), col("v").as("vb"))
      val j = a.join(b, Seq("bucket"))
      assert(j.count() == 4L * 100 * 6)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"partially-clustered SPJ must stay shuffle-free:\n$plan")
      // The skewed side is NOT collapsed to one task per value: the
      // per-file keyed partitions let Spark keep more than 4 tasks.
      assert(j.rdd.getNumPartitions > 4,
        s"expected per-file task granularity, got ${j.rdd.getNumPartitions}")
    }
  }

  test("boundary: join keys hitting a layout prefix co-partition under the subset conf") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-spj-prefix")
    def mk2(name: String, rows: Int): String = {
      val p = base.resolve(name).toString
      val df = (0 until rows)
        .map(i => (i.toLong, (i % 4).toLong, (i % 2).toLong, i * 10L))
        .toDF("id", "bucket", "sub", "v")
      GraftLake.appendPartitionedBy(df, p, Seq("bucket", "sub"))
      GraftLake.setPartitionColumns(p, Seq("bucket", "sub"))
      p
    }
    val pa = mk2("a", 40)
    val pb = mk2("b", 24)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // NOTE: every layout column must stay in BOTH scan outputs —
      // Spark resolves the reported key expressions against the scan
      // output, so pruning `sub` away silently drops the partitioning
      // (and the join falls back to a shuffle; see the off-case below).
      val a = spark.read.format("graftlake").load(pa)
        .select(col("bucket"), col("sub"), col("v").as("va"))
      val b = spark.read.format("graftlake").load(pb)
        .select(col("bucket"), col("sub"), col("v").as("vb"))
      // join on `bucket` alone — a strict PREFIX of the (bucket, sub)
      // layout; the subset conf lets Spark cluster both sides on it.
      val j = a.join(b, Seq("bucket"))
      assert(j.count() == 4L * 10 * 6)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"prefix join keys must co-partition under the subset conf:\n$plan")
    }
    // With the subset conf OFF, the same join silently falls back to
    // a correct shuffled plan — the spec'd boundary.
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graftlake").load(pa)
        .select(col("bucket"), col("sub"), col("v").as("va"))
      val b = spark.read.format("graftlake").load(pb)
        .select(col("bucket"), col("v").as("vb"))
      val j = a.join(b, Seq("bucket"))
      assert(j.count() == 4L * 10 * 6)
      assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }

  test("with the conf off the scan keeps per-file parallelism") {
    val base = Files.createTempDirectory("graft-spj-off")
    val p1 = mk(base, "a", 40)
    val df = spark.read.format("graftlake").load(p1)
    // 4 value partitions but per-file planning: at least 4 tasks, and
    // the scan reports no partitioning (content still exact)
    assert(df.count() == 40)
    assert(df.rdd.getNumPartitions >= 4)
  }
}
