package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthSourceSpec extends AnyFunSuite with SparkSpec {

  private def synth(rows: Long, parts: Int = 8) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("synthetic source: exact row count, deterministic across parallelism") {
    val a = synth(10000, 8)
    val b = synth(10000, 3)
    assert(a.count() == 10000)
    val sumA = a.agg(round(sum("value"), 4)).collect().head.getDouble(0)
    val sumB = b.agg(round(sum("value"), 4)).collect().head.getDouble(0)
    assert(sumA == sumB) // content independent of partitioning
    assert(a.rdd.getNumPartitions == 8 && b.rdd.getNumPartitions == 3)
  }

  test("synthetic source honors column pruning") {
    val df = synth(100).select("category")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("value"), s"pruned column still present:\n$plan")
    assert(df.distinct().count() == 10)
  }

  test("id-range filters push into the scan and shrink generated partitions") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = synth(100000, 8).filter(col("id") >= 99990 && col("id") < 99995)
    assert(df.collect().map(_.getAs[Long]("id")).sorted.toSeq ==
      (99990L until 99995L).toSeq)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case b: BatchScanExec => b }.headOption
      .getOrElse(fail(s"no BatchScanExec in:\n$plan"))
    assert(scan.scan.description().contains("PushedFilters"),
      scan.scan.description())
    assert(scan.scan.description().contains("[99990, 99995)"),
      s"range not narrowed at planning time: ${scan.scan.description()}")
    val generated = scan.inputPartitions
      .collect { case r: graft.sources.SynthRange => r.end - r.start }.sum
    assert(generated == 5, s"scan still generates $generated rows")
  }

  test("counting sink runs the full V2 batch commit protocol") {
    import graft.sources.CountingSink
    val df = synth(5000, 6)
    df.write.format("graft-counting-sink")
      .option("tag", "sink-spec").mode("overwrite").save()
    assert(CountingSink.committedRows("sink-spec").contains(5000L))
    // One commit message per input partition — the driver saw every
    // task's two-phase commit, not a collapsed single-writer path.
    assert(CountingSink.committedTasks("sink-spec").contains(6))
    // A second job with the same tag overwrites the registry entry.
    df.filter(col("id") < 100).write.format("graft-counting-sink")
      .option("tag", "sink-spec").mode("overwrite").save()
    assert(CountingSink.committedRows("sink-spec").contains(100L))
  }

  test("counting sink accepts any upstream plan (end of a real pipeline)") {
    import graft.sources.CountingSink
    graft.operators.Relational.q04JoinStar(spark, sf)
      .write.format("graft-counting-sink")
      .option("tag", "sink-pipeline").mode("overwrite").save()
    val rows = graft.operators.Relational.q04JoinStar(spark, sf).count()
    assert(CountingSink.committedRows("sink-pipeline").contains(rows))
  }

  test("synthetic source composes with engine operators") {
    val agg = synth(10000)
      .groupBy("category")
      .agg(count(lit(1)).as("n"), round(avg("value"), 2).as("avg_v"))
      .orderBy("category")
      .collect()
    assert(agg.length == 10)
    assert(agg.map(_.getAs[Long]("n")).sum == 10000)
  }

  test("runtime V2 filtering narrows the generated range from the join side") {
    import graft.sources.SynthSource
    val dim = spark.range(0, 1000000).toDF("k")
      .filter(col("k") >= 500100 && col("k") <= 500110)
    val joined = synth(1000000)
      .join(broadcast(dim), col("id") === col("k"))
    assert(joined.count() == 11)
    // The scan must have been handed the runtime IN filter and narrowed
    // its generated span to the dim's tiny key range — the DSv2 analog
    // of dynamic partition pruning. Check for ANY matching recorded
    // range: other scans (from concurrently running specs/gates) may
    // also record, and must not clobber this one's evidence.
    import scala.jdk.CollectionConverters._
    assert(SynthSource.runtimeRanges.asScala.exists { case (l, h) =>
      l >= 500100 && h <= 500111 },
      s"runtime range not narrowed: ${SynthSource.runtimeRanges}")
  }

  test("count/min/max push COMPLETELY into the source (metadata-only query)") {
    val df = synth(1000000)
      .filter(col("id") >= 250000 && col("id") < 750000)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"expected the aggregate inside the scan:\n$plan")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (500000L, 250000L, 499999L + 250000L))
    // Grouped/unsupported aggregates must DECLINE pushdown and still be
    // correct through the ordinary scan path.
    val grouped = synth(1000)
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
    // Empty range: SQL semantics — count 0, null min/max.
    val empty = synth(100).filter(col("id") > 1000)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
  }
}
