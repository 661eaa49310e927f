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
