package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Materialized

class MaterializedSpec extends AnyFunSuite with SparkSpec {

  test("incremental refresh equals full recompute, regardless of batching") {
    val orders = Tables.orders(spark, sf)
    val full = Materialized.present(Materialized.partialState(orders))
      .collect().map(_.toString).toSeq

    // one-shot incremental path (base + 2 deltas)
    val inc = Materialized.mv01IncrementalAgg(spark, sf)
      .collect().map(_.toString).toSeq
    assert(inc == full)

    // a different batching: per-year deltas folded one at a time
    val years = orders.select(year(col("o_orderdate")).as("y"))
      .distinct().collect().map(_.getInt(0)).sorted
    val byYear = years.tail.foldLeft(
      Materialized.partialState(orders.filter(year(col("o_orderdate")) === years.head))) {
      (view, y) => Materialized.mergeDelta(view, orders.filter(year(col("o_orderdate")) === y))
    }
    assert(Materialized.present(byYear).collect().map(_.toString).toSeq == full)
  }

  test("refresh cost is delta-sized: merge plan never rescans the base table") {
    // The merged plan reads the view state (already aggregated) and the
    // delta; the base orders scan appears only under the view lineage,
    // not again for the merge. Materialize the view first to make the
    // boundary real, as a production refresh would.
    val orders = Tables.orders(spark, sf)
    val viewPath = java.nio.file.Files.createTempDirectory("graft-mv").toString + "/mv"
    Materialized.partialState(orders.filter(year(col("o_orderdate")) < 2001))
      .write.parquet(viewPath)
    val view = spark.read.parquet(viewPath)
    val delta = orders.filter(year(col("o_orderdate")) === 2001)

    val merged = Materialized.mergeDelta(view, delta)
    val scans = merged.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("orders.parquet"))
    assert(scans.length == 1, s"expected exactly one base-table scan (the delta), got:\n$scans")
  }
}
