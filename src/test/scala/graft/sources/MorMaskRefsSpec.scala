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
}
