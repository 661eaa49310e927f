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

  test("compaction merges small files and preserves content") {
    val small = tmp() + "/orders_small"
    val compacted = tmp() + "/orders_compacted"
    val orders = Tables.orders(spark, sf)
    orders.repartition(64).write.parquet(small) // 64 tiny files
    def parquetFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(small).length == 64)

    val bytes = parquetFiles(small).map(_.length()).sum
    val n = Sources.compact(spark, small, compacted, targetFileBytes = bytes / 4)
    val got = parquetFiles(compacted).length
    assert(got <= n && got < 64, s"expected ~$n compacted files, got $got")
    assert(spark.read.parquet(compacted).orderBy("o_orderkey").collect().map(_.toString).toSeq ==
      orders.orderBy("o_orderkey").collect().map(_.toString).toSeq)
  }

  test("sorted compaction produces disjoint per-file key ranges (data skipping)") {
    val small = tmp() + "/orders_small2"
    val compacted = tmp() + "/orders_sorted"
    Tables.orders(spark, sf).repartition(16).write.parquet(small)
    Sources.compact(spark, small, compacted,
      targetFileBytes = 64L * 1024, sortCols = Seq("o_orderkey"))
    val files = new java.io.File(compacted).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1, "need multiple files to show range layout")
    // Per-file [min, max] of the sort key must not overlap: a filter on
    // the key then skips whole files via parquet min/max statistics.
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("o_orderkey"), max("o_orderkey")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file ranges: $hi vs $lo2")
    }
  }

  test("z-order compaction narrows per-file ranges on BOTH dimensions") {
    val small = tmp() + "/li_small"
    val zout = tmp() + "/li_zorder"
    // Two independent-ish dimensions a filter might hit.
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey", "l_quantity")
    li.repartition(8).write.parquet(small)
    val bytes = new java.io.File(small).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Sources.compactZOrder(spark, small, zout, "l_partkey", "l_suppkey",
      targetFileBytes = bytes / 8)
    val files = new java.io.File(zout).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 4, s"need several files, got ${files.length}")

    def ranges(c: String): Seq[(Double, Double)] = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).collect().head
      (r.getDouble(0), r.getDouble(1))
    }.toSeq
    def globalRange(c: String): Double = {
      val r = li.agg(min(col(c).cast("double")), max(col(c).cast("double"))).collect().head
      r.getDouble(1) - r.getDouble(0)
    }
    // With a LINEAR sort one dimension would stay full-range in every
    // file; z-order must shrink the AVERAGE per-file span of both.
    Seq("l_partkey", "l_suppkey").foreach { c =>
      val g = globalRange(c)
      val avg = ranges(c).map { case (lo, hi) => hi - lo }.sum / files.length
      assert(avg < 0.75 * g,
        f"$c avg per-file range $avg%.0f not narrowed vs global $g%.0f")
    }
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

  test("src08 compacted-layout scan equals the raw filter and shrinks the file count") {
    val rows = SparkEntry.queries("src08_compact_scan")(spark, sf).collect()
    val direct = Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 400000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), functions.round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy("o_orderstatus").collect()
    assert(rows.toSeq == direct.toSeq && rows.nonEmpty)
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    val inFiles = parquetFiles(SparkEntry.scratch("graft_compact_in", sf))
    val outFiles = parquetFiles(SparkEntry.scratch("graft_compact_out", sf))
    assert(outFiles < inFiles, s"compaction kept $outFiles of $inFiles files")
  }

  test("q51 injects a runtime Bloom filter on the fact side of the shuffle join") {
    val df = SparkEntry.queries("q51_bloom_join")(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
      s"expected a runtime bloom filter on the application side:\n$plan")
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), functions.round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy("o_orderstatus").collect()
    assert(rows.toSeq == direct.toSeq && rows.nonEmpty)
  }

  test("src07 prunes fact partitions dynamically from the dim-side filter") {
    val df = SparkEntry.queries("src07_dpp")(spark, sf)
    val rows = df.collect()
    // The fact scan carries a runtime pruning subquery on o_year even
    // though the query itself never filters o_year directly.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery in the fact scan:\n$plan")
    val direct = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) >= 1998)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), functions.round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy("o_orderstatus").collect()
    assert(rows.toSeq == direct.toSeq && rows.nonEmpty)
  }
}
