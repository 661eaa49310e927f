package graft

import java.nio.file.Files

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-sources").toString

  test("csv roundtrip preserves rows and schema") {
    val out = tmp() + "/nation_csv"
    val nation = Tables.nation(spark, sf)
    Sources.writeCsv(nation, out)
    val back = Sources.readCsv(spark, out, nation.schema)
    assert(back.count() == nation.count())
    assert(back.schema == nation.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.toString).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toString).toSeq)
  }

  test("json roundtrip preserves rows") {
    val out = tmp() + "/region_json"
    val region = Tables.region(spark, sf)
    Sources.writeJson(region, out)
    val back = Sources.readJson(spark, out, region.schema)
    assert(back.orderBy("r_regionkey").collect().map(_.toString).toSeq ==
      region.orderBy("r_regionkey").collect().map(_.toString).toSeq)
  }

  test("bucketed tables join with no shuffle exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    Sources.writeBucketed(o, "b_orders", Seq("o_custkey"), 8)
    Sources.writeBucketed(c, "b_customer", Seq("c_custkey"), 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          functions.col("o_custkey") === functions.col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      val expected = o.join(c, functions.col("o_custkey") === functions.col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout enables partition pruning") {
    val out = tmp() + "/orders_by_year"
    Sources.exportOrdersByYear(spark, sf, out)
    val back = Sources.readParquet(spark, out).filter(col("o_year") === 1997)
    // Pruning shows up as PartitionFilters on the scan, and the
    // filtered read must agree with the unpartitioned source.
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"))
    val expected = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(back.count() == expected && expected > 0)
  }
}
