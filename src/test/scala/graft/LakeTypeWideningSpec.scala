package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Type widening (Delta's type-widening table feature): a wide
  * writer evolves the schema along the lossless ladder (byte < short
  * < int < long, float < double) with ZERO bytes rewritten; narrow
  * file-sets serve the wide type through a pure cast in the
  * DataFrame read AND the DSv2 batch scan; narrow writers against an
  * already-wide table land as written and read up; anything off the
  * ladder refuses loudly.
  */
class LakeTypeWideningSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft-widen").resolve("t").toString

  test("int->long and float->double widen in place; values exact on both read paths") {
    import spark.implicits._
    val path = freshTable()
    val narrow = (1 to 50).map(i => (i, s"r$i", i * 1.5f))
      .toDF("k", "tag", "x")
    GraftLake.create(narrow, path)
    val setsBefore = GraftLake.snapshot(path).live.map(_.set).toSet
    val wide = (51L to 80L).map(i => (i, s"r$i", i * 1.5d))
      .toDF("k", "tag", "x")
    GraftLake.append(wide, path)
    // schema widened, narrow era's file-set untouched on disk
    val st = StructType.fromDDL(GraftLake.snapshot(path).schemaDdl)
    assert(st("k").dataType == LongType && st("x").dataType == DoubleType)
    assert(setsBefore.subsetOf(GraftLake.snapshot(path).live.map(_.set).toSet))
    val got = GraftLake.read(spark, path)
      .select("k", "tag", "x").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    val expect = ((1 to 50).map(i => (i.toLong, s"r$i", (i * 1.5f).toDouble)) ++
      (51L to 80L).map(i => (i, s"r$i", i * 1.5d))).sortBy(_._1)
    assert(got.toSeq == expect)
    // the DSv2 batch scan decodes narrow files under their written
    // types and widens per value — same rows, same schema
    val dsv = spark.read.format("graftlake").load(path)
      .select("k", "tag", "x").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(dsv.toSeq == expect)
  }

  test("a narrow late writer lands against the widened schema and reads up") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create(Seq((1L, 10L)).toDF("k", "v"), path)
    GraftLake.append(Seq((2, 20)).toDF("k", "v"), path) // int writer
    val st = StructType.fromDDL(GraftLake.snapshot(path).schemaDdl)
    assert(st("k").dataType == LongType && st("v").dataType == LongType)
    assert(GraftLake.read(spark, path).as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
  }

  test("zone-map stats stay sound across the widening (value domain is unchanged)") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create((1 to 100).map(i => (i, i)).toDF("k", "v"), path,
      statsCols = Seq("k"))
    GraftLake.append((101L to 200L).map(i => (i, i)).toDF("k", "v"), path,
      statsCols = Seq("k"))
    val (df, scanned, skipped) =
      GraftLake.readPruned(spark, path, Seq(("k", 150L, 160L)))
    assert(scanned == 1 && skipped == 1)
    assert(df.filter(col("k").between(150, 160)).count() == 11)
  }

  test("off-ladder evolution refuses loudly; long->int narrowing does not shrink the schema") {
    import spark.implicits._
    val path = freshTable()
    GraftLake.create(Seq((1L, "a")).toDF("k", "s"), path)
    val e = intercept[IllegalArgumentException] {
      GraftLake.append(Seq(("x", "b")).toDF("k", "s"), path)
    }
    assert(e.getMessage.contains("cannot change type"))
    // string->long is equally refused in the other direction
    val path2 = freshTable()
    GraftLake.create(Seq(("x", "b")).toDF("k", "s"), path2)
    intercept[IllegalArgumentException] {
      GraftLake.append(Seq((1L, "a")).toDF("k", "s"), path2)
    }
  }
}
