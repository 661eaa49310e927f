package graft

import java.nio.file.Files

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
