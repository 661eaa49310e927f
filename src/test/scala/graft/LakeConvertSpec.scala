package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** CONVERT TO GRAFTLAKE: adopt a plain parquet directory in place —
  * part files MOVE (zero bytes copied) into the first file-set, zone
  * maps recorded off the existing footers, and every lake capability
  * works on the adopted data.
  */
class LakeConvertSpec extends AnyFunSuite with SparkSpec {

  private def plainDir(): String =
    Files.createTempDirectory("graft-convert").resolve("t").toString

  private def topLevelParquets(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(path)).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
  }

  test("convert adopts the directory zero-copy; the lake lifecycle works after") {
    import spark.implicits._
    val path = plainDir()
    (1L to 100L).map(i => (i, i * 10)).toDF("id", "v")
      .repartition(4).write.parquet(path)
    val nParts = topLevelParquets(path).size
    assert(nParts == 4)
    val v0 = GraftLake.convert(spark, path, Some("id"))
    // Zero-copy: the part files MOVED into the set — none left on top,
    // the set holds exactly as many.
    assert(topLevelParquets(path).isEmpty)
    val s = GraftLake.snapshot(path)
    assert(s.version == v0 && s.live.size == 1)
    assert(topLevelParquets(path + "/" + s.live.head.set).size == nParts)
    // Zone maps recorded off the existing footers.
    assert(s.live.head.statsFor("id").exists(st => st.min == 1 && st.max == 100))
    assert(GraftLake.read(spark, path).count() == 100)
    // DML and time travel work on the adopted table.
    GraftLake.append((101L to 110L).map(i => (i, i * 10)).toDF("id", "v"),
      path, Some("id"))
    GraftLake.delete(spark, path, col("id") <= 10, Some("id"))
    assert(GraftLake.read(spark, path).count() == 100)
    assert(GraftLake.readAt(spark, path, v0).count() == 100)
    // Re-converting refuses: it is a lake table now.
    intercept[Exception] { GraftLake.convert(spark, path) }
  }

  test("refusals: hive-partitioned layout, missing statsCol, empty dir") {
    import spark.implicits._
    val part = plainDir()
    (1L to 20L).map(i => (i, i % 2)).toDF("id", "p")
      .write.partitionBy("p").parquet(part)
    val e = intercept[Exception] { GraftLake.convert(spark, part) }
    assert(e.getMessage.contains("hive-partitioned"))
    val flat = plainDir()
    (1L to 5L).map(i => (i, i)).toDF("id", "v").write.parquet(flat)
    intercept[Exception] { GraftLake.convert(spark, flat, Some("nope")) }
    intercept[Exception] {
      GraftLake.convert(spark,
        Files.createTempDirectory("graft-convert-empty").toString)
    }
  }

  test("SQL CONVERT TO GRAFTLAKE registers and the DML routes work") {
    import spark.implicits._
    val path = plainDir()
    (1L to 50L).map(i => (i, i % 5)).toDF("id", "m")
      .repartition(2).write.parquet(path)
    spark.sql(s"CONVERT TO GRAFTLAKE '$path' AS conv_t STATSCOL 'id'")
    assert(spark.sql("SELECT count(*) FROM conv_t").head.getLong(0) == 50)
    spark.sql("DELETE FROM conv_t WHERE m = 0")
    assert(spark.sql("SELECT count(*) FROM conv_t").head.getLong(0) == 40)
    spark.sql("OPTIMIZE conv_t")
    assert(spark.sql("SELECT count(*) FROM conv_t").head.getLong(0) == 40)
  }
}
