package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLake, LakeSql}

/** COPY INTO: idempotent batch file ingest — per-file exactly-once
  * through the log-carried ledger, directory growth loads only the
  * new files, the ledger rides checkpoints, races serialize.
  */
class LakeCopyIntoSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): (String, String) = {
    val base = Files.createTempDirectory("graft-copyinto")
    (base.resolve("t").toString, base.resolve("src").toString)
  }

  /** One parquet file of rows [lo, hi] at srcDir/<name>.parquet. */
  private def putFile(srcDir: String, name: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("ci-stage")
    (lo to hi).map(i => (i, s"r$i")).toDF("id", "tag")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(srcDir))
    Files.move(part, Paths.get(srcDir, s"$name.parquet"))
  }

  test("copyInto loads new files once; re-run no-op; growth loads only new") {
    val (p, src) = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    putFile(src, "a", 1, 10)
    putFile(src, "b", 11, 20)
    val (_, f1, r1) = GraftLake.copyInto(spark, p, src, statsCol = Some("id"))
    assert(f1 == 2 && r1 == 20)
    assert(GraftLake.read(spark, p).count() == 20)
    // re-run: pure no-op, no commit
    val v = GraftLake.latestVersion(p)
    val (_, f2, r2) = GraftLake.copyInto(spark, p, src)
    assert(f2 == 0 && r2 == 0L && GraftLake.latestVersion(p) == v)
    // directory grows: only the new file loads
    putFile(src, "c", 21, 25)
    val (_, f3, r3) = GraftLake.copyInto(spark, p, src, statsCol = Some("id"))
    assert(f3 == 1 && r3 == 5)
    assert(GraftLake.read(spark, p).count() == 25)
    // stats recorded on the copied sets
    assert(GraftLake.commits(p).filter(_.action == "copyinto")
      .forall(_.stats.exists(_.col == "id")))
  }

  test("the ingest ledger rides checkpoints") {
    val (p, src) = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    putFile(src, "a", 1, 10)
    GraftLake.copyInto(spark, p, src)
    GraftLake.checkpoint(p)
    // a post-checkpoint snapshot still knows file a: re-copy no-ops
    val (_, f, _) = GraftLake.copyInto(spark, p, src)
    assert(f == 0)
    putFile(src, "b", 11, 12)
    val (_, f2, _) = GraftLake.copyInto(spark, p, src)
    assert(f2 == 1 && GraftLake.read(spark, p).count() == 12)
  }

  test("schema alignment: by-name cast, null-fill, unknown refuses, CHECK gates") {
    import spark.implicits._
    val (p, src) = fresh()
    GraftLake.createEmpty(p, org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, tag STRING, extra BIGINT"))
    putFile(src, "a", 1, 5) // only (id, tag): extra null-fills
    val (_, f, _) = GraftLake.copyInto(spark, p, src)
    assert(f == 1)
    val got = GraftLake.read(spark, p)
    assert(got.count() == 5 && got.filter(col("extra").isNull).count() == 5)
    // unknown source column refuses
    val src2 = Files.createTempDirectory("ci-bad").toString
    (1 to 3).map(i => (i.toLong, s"x$i", i, i)).toDF("id", "tag", "extra", "nope")
      .coalesce(1).write.mode("overwrite").parquet(src2 + "/d")
    val err = intercept[Exception] {
      GraftLake.copyInto(spark, p, src2 + "/d")
    }
    assert(err.getMessage.contains("nope"))
    // CHECK constraint rejects a violating batch atomically
    GraftLake.addConstraint(spark, p, "pos", "id > 0")
    val src3 = Files.createTempDirectory("ci-neg").resolve("s").toString
    putFile(src3, "neg", -5, -1)
    val before = GraftLake.read(spark, p).count()
    intercept[Exception] { GraftLake.copyInto(spark, p, src3) }
    assert(GraftLake.read(spark, p).count() == before)
  }

  test("SQL COPY INTO routes, reports counts, refreshes the view") {
    val (p, src) = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    LakeSql.register(spark, p, "ci_t", "id")
    putFile(src, "a", 1, 10)
    val r = spark.sql(s"COPY INTO ci_t FROM '$src' FILEFORMAT = PARQUET").head
    assert(r.getInt(0) == 1 && r.getLong(1) == 10L)
    assert(spark.sql("SELECT count(*) FROM ci_t").head.getLong(0) == 10L)
    val r2 = spark.sql(s"COPY INTO ci_t FROM '$src'").head
    assert(r2.getInt(0) == 0 && r2.getLong(1) == 0L)
    LakeSql.unregister("ci_t")
  }

  test("csv ingest store-assign casts through the table schema") {
    val (p, src) = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    Files.createDirectories(Paths.get(src))
    Files.writeString(Paths.get(src, "a.csv"), "id,tag\n1,x\n2,y\n")
    val (_, f, r) = GraftLake.copyInto(spark, p, src, format = "csv")
    assert(f == 1 && r == 2)
    assert(GraftLake.read(spark, p).agg(sum(col("id"))).head.getLong(0) == 3L)
  }

  test("racing copies of the same directory never double-load a file") {
    val (p, src) = fresh()
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    (0 until 4).foreach(i => putFile(src, s"f$i", i * 10L + 1, i * 10L + 10))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val loads = Await.result(Future.sequence((1 to 3).map(_ =>
      Future(GraftLake.copyInto(spark, p, src)._2))), 120.seconds)
    assert(loads.sum == 4, s"per-writer loads $loads must sum to 4")
    assert(GraftLake.read(spark, p).count() == 40)
    assert(GraftLake.snapshot(p).ingested.size == 4)
  }

  test("same name+size from a DIFFERENT directory is a different file") {
    val (p, src1) = fresh()
    val src2 = Paths.get(src1).getParent.resolve("src2").toString
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    // identical bytes (same rows) → same basename AND same size: the
    // exact collision the path-keyed ledger exists for
    putFile(src1, "data", 1, 10)
    putFile(src2, "data", 1, 10)
    assert(Files.size(Paths.get(src1, "data.parquet")) ==
      Files.size(Paths.get(src2, "data.parquet")))
    val (_, f1, _) = GraftLake.copyInto(spark, p, src1)
    val (_, f2, _) = GraftLake.copyInto(spark, p, src2)
    assert(f1 == 1 && f2 == 1, "the second directory's file must load")
    assert(GraftLake.read(spark, p).count() == 20)
    // and each directory stays individually idempotent
    assert(GraftLake.copyInto(spark, p, src1)._2 == 0)
    assert(GraftLake.copyInto(spark, p, src2)._2 == 0)
  }

  test("legacy name:size ledger entries refuse loudly, never silently skip") {
    import scala.jdk.CollectionConverters._
    val (p, src1) = fresh()
    val src2 = Paths.get(src1).getParent.resolve("src2").toString
    GraftLake.createEmpty(p,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, tag STRING"))
    putFile(src1, "data", 1, 10)
    putFile(src2, "data", 1, 10)
    GraftLake.copyInto(spark, p, src1)
    // Rewrite the ledger to the PRE-path-keyed form (bare name:size)
    // — simulating a table ingested before the upgrade.
    val logDir = Paths.get(p, "_graft_log")
    Files.list(logDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json")).foreach { f =>
        val lines = Files.readString(f).split("\n").map { line =>
          if (!line.contains("\"ingestf\"")) line
          else {
            val body0 = line.substring(0, line.lastIndexOf(""","crc":"""))
            val body = body0.replaceAll("""/[^"]*/(data\.parquet:)""", "$1")
            val c = new java.util.zip.CRC32()
            c.update(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            body + s""","crc":${c.getValue}}"""
          }
        }
        Files.writeString(f, lines.mkString("\n"))
      }
    assert(GraftLake.snapshot(p).ingested.contains(
      s"data.parquet:${Files.size(Paths.get(src2, "data.parquet"))}"))
    // A same-name:size file from ANOTHER directory is ambiguous under
    // the legacy ledger — must refuse, not silently no-op.
    val err = intercept[IllegalStateException] {
      GraftLake.copyInto(spark, p, src2)
    }
    assert(err.getMessage.contains("legacy"))
  }
}
