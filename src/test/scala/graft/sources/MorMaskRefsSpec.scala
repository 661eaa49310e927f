package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Task-side merge-on-read mask loading for the DSv2 batch scan: the
  * driver plans with sidecar DESCRIPTORS only (ScanMaskRefs — set
  * directories, O(sidecar sets) strings), and every partition reader
  * resolves its own file's DV positions / the key tombstone values
  * executor-side (MorMasks). These specs pin (a) value-exactness
  * against the DataFrame path under stacked DV + key-tombstone state,
  * and (b) the bounded-driver property at one million masked
  * positions — the scale the old plan-time collect() materialized on
  * the driver.
  */
class MorMaskRefsSpec extends AnyFunSuite with SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-morrefs").resolve("t").toString

  test("DSv2 scan under stacked DVs + key tombstones matches the DataFrame path") {
    import spark.implicits._
    val p = fresh()
    val df = (1L to 3000L).map(i => (i, i % 7, s"r$i")).toDF("id", "g", "tag")
    GraftLake.create(df.filter(col("id") <= 1000), p, statsCols = Seq("id"))
    GraftLake.append(df.filter(col("id") > 1000 && col("id") <= 2000), p,
      statsCols = Seq("id"))
    GraftLake.append(df.filter(col("id") > 2000), p, statsCols = Seq("id"))
    // Two stacked DV sidecars + one key tombstone set.
    GraftLake.deleteDv(spark, p, col("id") % 5 === 0)
    GraftLake.deleteDv(spark, p, col("id") % 11 === 3)
    GraftLake.deleteMoR(spark, p, col("g") === 2, "id")
    val refs = {
      val s = GraftLake.snapshot(p)
      GraftLake.loadScanMaskRefs(p, s.tombstones)
    }
    assert(refs.dvDirs.size == 2 && refs.keyRefs.size == 1,
      s"descriptor shapes: ${refs.dvDirs.size} dv dirs, " +
        s"${refs.keyRefs.size} key refs")
    val viaDf = GraftLake.read(spark, p)
      .select(col("id"), col("g"), col("tag"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val viaScan = spark.read.format("graftlake").load(p)
      .select(col("id"), col("g"), col("tag"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(viaScan.length == viaDf.length)
    assert(viaScan.sameElements(viaDf))
  }

  test("one million masked positions: bounded driver planning, exact task-side masking") {
    import spark.implicits._
    val p = fresh()
    val n = 2000000L
    // One flat set, several part files.
    GraftLake.create(
      spark.range(1L, n + 1L, 1L, 8).select(col("id"), (col("id") * 3).as("v")),
      p, statsCols = Seq("id"))
    val (_, masked) = GraftLake.deleteDv(spark, p, col("id") % 2 === 0)
    assert(masked == n / 2, s"expected ${n / 2} masked rows, got $masked")
    // The PLANNING product is descriptors only: O(sidecar sets)
    // strings, no position values — this is the bounded-driver pin
    // (the old ScanMasks held all 1M positions here).
    val s = GraftLake.snapshot(p)
    val refs = GraftLake.loadScanMaskRefs(p, s.tombstones)
    assert(refs.dvDirs.size == 1 && refs.keyRefs.isEmpty)
    // Readers load per-file masks task-side; the visible multiset is
    // exactly the odd ids.
    val agg = spark.read.format("graftlake").load(p)
      .agg(count(lit(1)), sum(col("id"))).head
    assert(agg.getLong(0) == n / 2)
    // sum of odd ids in [1, n]: (n/2)^2
    assert(agg.getLong(1) == (n / 2) * (n / 2))
  }

  test("per-file DV position loading returns exactly that file's mask") {
    import spark.implicits._
    val p = fresh()
    GraftLake.create(
      spark.range(1L, 10001L, 1L, 4).select(col("id"), (col("id") % 3).as("m")),
      p, statsCols = Seq("id"))
    GraftLake.deleteDv(spark, p, col("m") === 1)
    val s = GraftLake.snapshot(p)
    val refs = GraftLake.loadScanMaskRefs(p, s.tombstones)
    val ls = s.live.head
    val setDir = java.nio.file.Paths.get(GraftLake.setPathOf(p, ls.set))
    val listing = Files.list(setDir)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
      } finally listing.close()
    assert(files.size >= 2, s"want multiple part files, got ${files.size}")
    // Union of per-file masks == the sidecar's full content; each
    // file's mask contains only row indices that exist in that file,
    // and no two files' masks are conflated.
    val perFile = files.map(f =>
      f -> MorMasks.dvPositions(refs.dvDirs, ls.set, f))
    val total = perFile.map(_._2.size()).sum
    val sidecarRows = spark.read
      .parquet(GraftLake.setPathOf(p, s.tombstones.head)).count()
    assert(total.toLong == sidecarRows,
      s"per-file masks cover $total of $sidecarRows sidecar rows")
    // A file name that is not in the sidecar resolves to an empty mask.
    assert(MorMasks.dvPositions(refs.dvDirs, ls.set, "no-such.parquet").isEmpty)
  }

  test("many sidecar sets: a reader opens only the sidecars targeting its own set") {
    import spark.implicits._
    val p = fresh()
    // FIVE independently-masked data sets, each with its own DV commit
    // — five outstanding sidecar sets, each targeting exactly one set.
    (0 until 5).foreach { k =>
      val lo = k * 1000L + 1L
      val part = spark.range(lo, lo + 1000L, 1L, 2)
        .select(col("id"), (col("id") % 9).as("m"))
      if (k == 0) GraftLake.create(part, p, statsCols = Seq("id"))
      else GraftLake.append(part, p, statsCols = Seq("id"))
      GraftLake.deleteDv(spark, p,
        col("id") >= lo && col("id") < lo + 1000L && col("id") % 4 === 1)
    }
    val s = GraftLake.snapshot(p)
    val refs = GraftLake.loadScanMaskRefs(p, s.tombstones)
    assert(refs.dvDirs.size == 5)
    // Every sidecar carries a commit-time target manifest naming
    // EXACTLY its own data set.
    val manifests = refs.dvDirs.map(MorMasks.targetsOf)
    assert(manifests.forall(_.exists(_.size == 1)),
      s"per-sidecar targets: ${manifests.mkString(", ")}")
    assert(manifests.flatMap(_.get).toSet == s.live.map(_.set).toSet)
    // dvTargetSets answers from the manifest — identical to the
    // parquet-row fallback.
    refs.dvDirs.foreach { d =>
      val viaManifest = MorMasks.dvTargetSets(d)
      val viaRows = spark.read.parquet(d).select(col("__dv_set"))
        .distinct().collect().map(_.getString(0)).toSet
      assert(viaManifest == viaRows)
    }
    // O(own blob) reads: CORRUPT every other sidecar's parquet bytes —
    // a reader of set k still resolves its masks exactly, proving it
    // never opened the non-targeting sidecars (the pre-manifest code
    // opened a footer of EVERY sidecar part-file per masked file).
    val bySet = s.live.sortBy(_.statsFor("id").get.min).map(_.set)
    val ownSet = bySet.head
    val ownDir = refs.dvDirs.find(d =>
      MorMasks.targetsOf(d).get.contains(ownSet)).get
    refs.dvDirs.filterNot(_ == ownDir).foreach { d =>
      import scala.jdk.CollectionConverters._
      val listing = Files.list(java.nio.file.Paths.get(d))
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(f => Files.write(f, Array[Byte](0, 1, 2, 3)))
      finally listing.close()
    }
    val setDir = java.nio.file.Paths.get(GraftLake.setPathOf(p, ownSet))
    val listing = Files.list(setDir)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
      } finally listing.close()
    val total = files.map(f =>
      MorMasks.dvPositions(refs.dvDirs, ownSet, f).size()).sum
    // ids lo..lo+999 with id % 4 == 1: exactly 250 masked positions.
    assert(total == 250, s"own-set masks after corrupting others: $total")
  }
}
