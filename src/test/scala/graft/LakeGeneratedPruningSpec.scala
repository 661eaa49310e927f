package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Generated-column transitive pruning: base-column predicates derive
  * zone-map constraints on generated columns whose recorded expression
  * is a recognized monotone function of the base (`b div N`,
  * `year(b)` over DATE) — Delta's generated-column partition pruning.
  */
class LakeGeneratedPruningSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-genprune").resolve("t").toString

  test("id div N layout: base-column predicates prune without base stats") {
    import spark.implicits._
    val p = fresh()
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, i / 100L, i * 2)).toDF("id", "bucket", "v")
    GraftLake.create(mk(0, 100), p, statsCols = Seq("bucket"))
    GraftLake.append(mk(100, 200), p, statsCols = Seq("bucket"))
    GraftLake.append(mk(200, 300), p, statsCols = Seq("bucket"))
    GraftLake.recordColDefs(p, Seq.empty, Seq("bucket" -> "id div 100"))
    GraftLake.enableDeletionVectors(p)
    // no stats on id at all — only the derived bucket range can prune
    GraftLake.deleteDv(spark, p, expr("id >= 250"))
    assert(GraftLake.lastDvScanSets == ((1, 2)),
      s"expected 1/2 via derivation, got ${GraftLake.lastDvScanSets}")
    assert(GraftLake.read(spark, p).count() == 250)
    // equality derives the exact bucket
    GraftLake.deleteDv(spark, p, expr("id = 150"))
    assert(GraftLake.lastDvScanSets == ((1, 2)))
    assert(GraftLake.read(spark, p).count() == 249)
    // an unrecognized expression shape derives nothing (conservative):
    // predicates on v scan everything rather than guessing
    GraftLake.deleteDv(spark, p, expr("v = 8"))
    assert(GraftLake.lastDvScanSets == ((3, 0)))
  }

  test("year(DATE) layout: a date predicate opens one year's set") {
    import spark.implicits._
    val p = fresh()
    val mk = (yr: Int) => (1 to 20).map { i =>
      (java.sql.Date.valueOf(f"$yr-01-$i%02d"), yr.toLong, i.toLong)
    }.toDF("day", "yr", "v")
    GraftLake.create(mk(1993), p, statsCols = Seq("yr"))
    GraftLake.append(mk(1994), p, statsCols = Seq("yr"))
    GraftLake.append(mk(1995), p, statsCols = Seq("yr"))
    GraftLake.recordColDefs(p, Seq.empty, Seq("yr" -> "year(day)"))
    GraftLake.enableDeletionVectors(p)
    GraftLake.deleteDv(spark, p,
      expr("day >= DATE'1994-01-01' AND day < DATE'1995-01-01'"))
    assert(GraftLake.lastDvScanSets == ((1, 2)),
      s"expected the 1994 set only, got ${GraftLake.lastDvScanSets}")
    assert(GraftLake.read(spark, p).count() == 40)
    assert(GraftLake.read(spark, p)
      .filter(year(col("day")) === 1994).count() == 0)
  }

  test("the DSv2 batch scan derives the same constraints at plan time") {
    import spark.implicits._
    val p = fresh()
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, i / 100L, i * 2)).toDF("id", "bucket", "v")
    GraftLake.create(mk(0, 100), p, statsCols = Seq("bucket"))
    GraftLake.append(mk(100, 200), p, statsCols = Seq("bucket"))
    GraftLake.append(mk(200, 300), p, statsCols = Seq("bucket"))
    GraftLake.recordColDefs(p, Seq.empty, Seq("bucket" -> "id div 100"))
    val lake = spark.read.format("graftlake").load(p)
    assert(lake.filter(col("id") === 123L).count() == 1)
    assert(graft.sources.GraftLakeBatchSource.lastScanSets == ((1, 2)),
      s"got ${graft.sources.GraftLakeBatchSource.lastScanSets}")
    assert(lake.filter(col("id") >= 150L && col("id") < 250L).count() == 100)
    assert(graft.sources.GraftLakeBatchSource.lastScanSets == ((2, 1)))
  }
}
