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
}
