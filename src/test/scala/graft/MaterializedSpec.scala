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
        (col("rev_raw") / 100.0).as("rev"))
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

  test("streaming deltas refresh the view via foreachBatch to the full-recompute answer") {
    // Exercises the REAL gated path (file-source stream staging three
    // pmod thirds of the orders as parquet deltas) — no driver-side
    // collect of the base table anywhere.
    val orders = Tables.orders(spark, sf)
    val got = Materialized.mv03StreamRefresh(spark, sf)
      .collect().map(_.toString).toSeq
    val full = Materialized.present(Materialized.partialState(orders))
      .collect().map(_.toString).toSeq
    assert(got == full)
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

  test("mv04 signed algebra: delete-then-reinsert is the identity, exactly") {
    val orders = Tables.orders(spark, sf)
    val slice = orders.filter(pmod(col("o_orderkey"), lit(7)) === 3)
    val base = Materialized.signedState(orders, 1)
    val roundTrip = Materialized.mergeSigned(
      Materialized.mergeSigned(base, slice, -1), slice, 1)
    // Integer cents => bit-exact equality with the untouched state, not
    // just tolerance — the property float sums cannot give.
    val a = base.orderBy("o_year", "o_orderstatus").collect().map(_.toString).toSeq
    val b = roundTrip.orderBy("o_year", "o_orderstatus").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("mv04 deletes drop emptied groups and match the filtered recompute") {
    val orders = Tables.orders(spark, sf)
    val got = Materialized.mv04RetractView(spark, sf)
      .collect().map(_.toString).toSeq
    val surviving = orders.filter(
      pmod(col("o_orderkey"), lit(10)) =!= 7 || pmod(col("o_orderkey"), lit(20)) === 7)
    val expect = Materialized.signedState(surviving, 1)
      .select(col("o_year"), col("o_orderstatus"), col("n"),
        round(col("cents") / 100.0, 2).as("rev"))
      .orderBy("o_year", "o_orderstatus")
      .collect().map(_.toString).toSeq
    assert(got == expect)
    // Deleting EVERYTHING empties the view (the n == 0 drop path).
    val emptied = Materialized.mergeSigned(
      Materialized.signedState(orders, 1), orders, -1)
    assert(emptied.count() == 0)
  }

  test("mv05 min/max view equals the recompute and merges order-invariantly") {
    val got = Materialized.mv05MinmaxView(spark, sf)
      .collect().map(_.toString).toSeq
    val orders = Tables.orders(spark, sf)
    val direct = orders
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy("o_year", "o_orderstatus")
      .collect().map(_.toString).toSeq
    assert(got == direct)
    // Semilattice: refreshing the same batches in the opposite order
    // reaches the same state.
    val y = year(col("o_orderdate"))
    val maxYear = orders.agg(max(y)).collect().head.getInt(0)
    val base = orders.filter(y.isNull || y < maxYear)
    val h1 = orders.filter(y === maxYear && month(col("o_orderdate")) <= 6)
    val h2 = orders.filter(y === maxYear && month(col("o_orderdate")) > 6)
    val swapped = Materialized.mergeMinmax(
      Materialized.mergeMinmax(Materialized.minmaxState(h2), h1), base)
      .select(col("o_year"), col("o_orderstatus"), col("n"),
        round(col("min_price"), 2).as("min_price"),
        round(col("max_price"), 2).as("max_price"))
      .orderBy("o_year", "o_orderstatus")
      .collect().map(_.toString).toSeq
    assert(swapped == direct)
  }

  test("mv06 HLL sketch view: refresh batching cannot change the estimate") {
    val rows = Materialized.mv06SketchView(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")), r.toString)
      assert(r.getBoolean(r.fieldIndex("merge_exact")), r.toString)
    }
    // groups here are far below sketch capacity: sparse-mode HLL is
    // EXACT, so the estimate equals the true distinct count outright
    val exact = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("nd"))
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0),
        r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val k = (if (r.isNullAt(0)) -1 else r.getInt(0), r.getString(1))
      assert(r.getLong(r.fieldIndex("exact_nd")) == exact(k))
    }
  }

  test("mv08 top-k view: refresh batching is invariant and equals the full ranking") {
    val orders = Tables.orders(spark, sf)
    val full = Materialized.presentTopk(Materialized.topkState(orders))
      .collect().map(_.toString).toSeq
    // Any insert-only split folds to the same leaderboard — including
    // a shuffled (non-time) assignment.
    val parts = (0 until 4).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(4)) === i))
    val folded = Materialized.presentTopk(
      parts.tail.foldLeft(Materialized.topkState(parts.head))(Materialized.mergeTopk))
      .collect().map(_.toString).toSeq
    assert(folded == full)
    val gate = Materialized.mv08TopkView(spark, sf).collect().map(_.toString).toSeq
    assert(gate == full)
    // The state really is O(groups x k): every group holds <= 5 rows.
    val got = Materialized.mv08TopkView(spark, sf).collect()
    got.groupBy(_.getString(0)).values.foreach(rs => assert(rs.length <= 5))
  }

  test("mv07 retractable join view equals the recompute, and delete-all empties it") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val got = Materialized.mv07RetractJoinView(spark, sf).collect()
      .map(_.toString).toSeq
    val want = orders
      .filter(pmod(col("o_orderkey"), lit(10)) =!= 7 ||
        pmod(col("o_orderkey"), lit(20)) === 7)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("o_totalprice") * 100).cast("long")) / 100.0, 2).as("rev"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
      .collect().map(_.toString).toSeq
    assert(got == want)
    // Inserting then retracting the SAME delta is a bit-exact no-op...
    val base = Materialized.signedJoinState(orders, customer, 1)
    val delta = orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
    val cycled = Materialized.mergeSignedJoin(
      Materialized.mergeSignedJoin(base, delta, customer, 1),
      delta, customer, -1)
    assert(cycled.orderBy("c_mktsegment", "o_orderstatus").collect().toSeq ==
      base.orderBy("c_mktsegment", "o_orderstatus").collect().toSeq)
    // ...and retracting everything drops every group (empty view).
    val emptied = Materialized.mergeSignedJoin(base, orders, customer, -1)
    assert(emptied.count() == 0)
  }
}
