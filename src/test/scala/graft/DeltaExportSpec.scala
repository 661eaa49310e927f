package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaExport, DeltaImport, GraftLake}

/** Delta export: self-contained public-protocol output, row-exact
  * round trips in both flat and partitioned layouts, and the loud
  * refusals (MoR state, rename lineage, existing target).
  */
class DeltaExportSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-dexp-$tag").resolve("t").toString

  test("flat export round-trips row-exactly through the public log") {
    import spark.implicits._
    val gp = fresh("flat"); val dp = fresh("flatd"); val gp2 = fresh("flatb")
    val df = (1 to 40).map(i => (i.toLong, s"r$i", i % 3)).toDF("id", "tag", "m")
    GraftLake.create(df, gp, statsCols = Seq("id"))
    GraftLake.append(df.filter(col("id") <= 10)
      .withColumn("id", col("id") + 100L), gp)
    DeltaExport.exportDelta(spark, gp, dp)
    // the exported log parses as a valid delta table
    val st = DeltaImport.foldDeltaLog(spark, dp)
    assert(st.partitionCols.isEmpty && st.activeFiles.nonEmpty)
    DeltaImport.importDelta(spark, dp, gp2)
    val a = GraftLake.read(spark, gp).select("id", "tag", "m")
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = GraftLake.read(spark, gp2).select("id", "tag", "m")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == 50 && (a sameElements b))
  }

  test("partitioned export lays hive dirs + partitionValues; re-import re-pins") {
    import spark.implicits._
    val gp = fresh("p"); val dp = fresh("pd"); val gp2 = fresh("pb")
    val df = (1 to 30).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "b")
    GraftLake.appendPartitionedBy(df, gp, Seq("b"), statsCols = Seq("id"))
    GraftLake.setPartitionColumns(gp, Seq("b"))
    DeltaExport.exportDelta(spark, gp, dp)
    val st = DeltaImport.foldDeltaLog(spark, dp)
    assert(st.partitionCols == Seq("b"))
    assert(st.activeFiles.forall(_._2.keySet == Set("b")))
    // hive layout on disk, partition column dropped from the files
    locally {
      import scala.jdk.CollectionConverters._
      assert(Files.list(Paths.get(dp)).iterator().asScala.exists(p =>
        p.getFileName.toString.startsWith("b=")))
    }
    DeltaImport.importDelta(spark, dp, gp2)
    assert(GraftLake.read(spark, gp2).count() == 30)
    assert(GraftLake.read(spark, gp2).filter(col("b") === 1L).count() == 10)
    assert(GraftLake.snapshot(gp2).live.forall(
      _.statsFor("b").exists(s => s.min == s.max)))
  }

  test("hive directory escaping decodes to the TRUE partition values") {
    // Spark percent-encodes special characters in partition dirs and
    // writes __HIVE_DEFAULT_PARTITION__ for null — partitionValues
    // must carry the decoded value / JSON null, never the dir text
    assert(DeltaExport.hiveUnescape("a%3Ab") == Some("a:b"))
    assert(DeltaExport.hiveUnescape("x%3D1%25") == Some("x=1%"))
    assert(DeltaExport.hiveUnescape("plain") == Some("plain"))
    assert(DeltaExport.hiveUnescape("100%") == Some("100%")) // not an escape
    assert(DeltaExport.hiveUnescape("__HIVE_DEFAULT_PARTITION__").isEmpty)
  }

  test("live deletion vectors export as REAL Delta DVs: zero data rewritten, round-trip exact") {
    import spark.implicits._
    val gp = fresh("dv"); val dp = fresh("dvd"); val gp2 = fresh("dvb")
    val df = (1 to 60).map(i => (i.toLong, s"r$i", i % 4)).toDF("id", "tag", "m")
    GraftLake.create(df.repartition(3), gp, statsCols = Seq("id"))
    GraftLake.enableDeletionVectors(gp)
    // two stacked DV deletes leave live position sidecars
    GraftLake.deleteDv(spark, gp, col("id") % 5L === 0L)
    GraftLake.deleteDv(spark, gp, col("id") === 7L)
    val visible = GraftLake.read(spark, gp).select("id", "tag", "m")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(visible.length == 60 - 12 - 1)
    DeltaExport.exportDelta(spark, gp, dp)
    // the log is ONE commit of remove-free adds, some carrying inline
    // deletion vectors, under the deletionVectors protocol
    val log = Files.readString(
      Paths.get(dp, "_delta_log", "0" * 20 + ".json"))
    assert(log.contains("\"minReaderVersion\":3"))
    assert(log.contains("\"deletionVectors\""))
    assert(log.contains("\"storageType\":\"i\""))
    assert(!log.contains("\"remove\""))
    // ZERO data rewritten: every exported parquet is byte-identical
    // to the graft set file it was copied from
    val snap = GraftLake.snapshot(gp)
    snap.live.foreach { ls =>
      import scala.jdk.CollectionConverters._
      val setDir = Paths.get(s"$gp/${ls.set}")
      val listing = Files.list(setDir)
      val fs = try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        finally listing.close()
      assert(fs.nonEmpty)
      fs.foreach { f =>
        val exported = Paths.get(dp, ls.set, f.getFileName.toString)
        assert(Files.exists(exported), s"missing copy $exported")
        assert(java.util.Arrays.equals(
          Files.readAllBytes(f), Files.readAllBytes(exported)))
      }
    }
    // round trip: the src72 import path reads the DVs back and the
    // visible rows match exactly
    DeltaImport.importDelta(spark, dp, gp2)
    val back = GraftLake.read(spark, gp2).select("id", "tag", "m")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(visible sameElements back)
  }

  test("DV export falls back to materializing for partitioned layouts") {
    import spark.implicits._
    val gp = fresh("dvp"); val dp = fresh("dvpd")
    val df = (1 to 40).map(i => (i.toLong, i % 2, s"r$i")).toDF("id", "p", "tag")
    GraftLake.appendPartitionedBy(df, gp, Seq("p"), statsCols = Seq("id"))
    GraftLake.setPartitionColumns(gp, Seq("p"))
    GraftLake.enableDeletionVectors(gp)
    GraftLake.deleteDv(spark, gp, col("id") <= 5L)
    DeltaExport.exportDelta(spark, gp, dp)
    // the materializing path: basic protocol, hive layout, no DVs in
    // the log, masked rows already dropped from the data files
    val log = Files.readString(
      Paths.get(dp, "_delta_log", "0" * 20 + ".json"))
    assert(log.contains("\"minReaderVersion\":1"))
    assert(!log.contains("deletionVector"))
    val (out, st) = DeltaImport.readDelta(spark, dp)
    assert(st.partitionCols == Seq("p"))
    assert(out.count() == 35)
    assert(out.filter(col("id") <= 5L).count() == 0)
  }

  test("roaring DV serialization round-trips through the import reader") {
    // array containers, bitmap container (>4096 in one 64k chunk),
    // multi-container, multi-bitmap (positions past 2^32), empties
    val cases: Seq[Array[Long]] = Seq(
      Array(0L),
      Array(1L, 2L, 3L, 70000L, 70001L),
      (0L until 5000L).toArray, // bitmap container
      Array(5L, (1L << 32) + 9L, (1L << 33) + 2L), // empty mid bitmaps
      (0L until 200L).map(_ * 1021L).toArray)
    cases.foreach { ps =>
      val raw = DeltaImport.serializeRoaringArray(ps)
      val got = DeltaImport.roaringArrayPositions(raw)
      assert(got.toSeq == ps.distinct.sorted.toSeq, ps.take(5).toSeq)
    }
    // and through the z85 + padding leg the inline descriptor uses
    val ps = Array(3L, 4096L, 65536L, 99999L)
    val raw = DeltaImport.serializeRoaringArray(ps)
    val padded = raw ++ Array.fill((4 - raw.length % 4) % 4)(0.toByte)
    val dec = DeltaImport.z85Decode(DeltaImport.z85Encode(padded))
    assert(DeltaImport.roaringArrayPositions(dec.take(raw.length)).toSeq ==
      ps.toSeq)
  }

  test("export serves MoR-masked and renamed states; refuses an existing target") {
    import spark.implicits._
    val gp = fresh("r")
    val df = (1 to 20).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    GraftLake.create(df, gp, statsCols = Seq("id"), bloomCols = Seq("id"))
    GraftLake.renameColumn(gp, "tag", "label") // lineage first: the
    // rename fence refuses while tombstones are outstanding
    GraftLake.deleteMoR(spark, gp, col("id") === 3L, "id") // key tombstone
    val dp = fresh("rd")
    // the rewrite goes through GraftLake.read: the tombstoned row never
    // reaches the Delta files and the files carry the CURRENT names
    DeltaExport.exportDelta(spark, gp, dp)
    val out = DeltaImport.readDelta(spark, dp)._1
    assert(out.columns.toSeq == Seq("id", "label"))
    assert(out.count() == 19)
    assert(out.filter(col("id") === 3L).count() == 0)
    val e = intercept[IllegalArgumentException](
      DeltaExport.exportDelta(spark, gp, dp))
    assert(e.getMessage.contains("already exists"))
  }
}
