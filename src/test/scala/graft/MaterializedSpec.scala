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

  test("mv02 incremental join-view refresh equals the full join recompute") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val full = Materialized.partialJoinState(orders, customer)
      .select(col("c_mktsegment"), col("o_orderstatus"), col("n"),
        round(col("rev_raw"), 2).as("rev"))
      .orderBy("c_mktsegment", "o_orderstatus")
      .collect().map(_.toString).toSeq
    val inc = Materialized.mv02JoinView(spark, sf).collect().map(_.toString).toSeq
    assert(inc == full)
  }

  test("mv01/mv02 degrade gracefully on an empty base table") {
    import spark.implicits._
    val empty = Tables.orders(spark, sf).filter(col("o_orderkey") < 0)
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-mv-empty").toString
    empty.write.parquet(s"$emptyDir/orders.parquet")
    Tables.customer(spark, sf).write.parquet(s"$emptyDir/customer.parquet")
    assert(Materialized.mv01IncrementalAgg(spark, emptyDir).collect().isEmpty)
    assert(Materialized.mv02JoinView(spark, emptyDir).collect().isEmpty)
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
