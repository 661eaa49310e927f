package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Micro-batch input staging for the file-source stream gates.
  *
  * The gates drive N micro-batches by staging N disjoint slices of one
  * source table into the stream's input directory. Writing each slice
  * with its own `df.filter(pred).write` scans the source N times; this
  * helper scans it ONCE — one dynamic-partition write keyed on the
  * 0-based batch column — then MOVES batch k's files into the input
  * dir (same filesystem, O(1) renames) right before the caller drains
  * micro-batch k. File names are prefixed with the batch number so two
  * batches' identically-named part files never collide in the flat
  * input dir. Rows, slice membership and arrival order are exactly the
  * per-slice-write staging's; only the number of source scans changes.
  */
private[graft] object Staging {

  /** Write `df` sliced by `batchCol` (values 0 until n) in one pass,
    * then for k = 0 until n: move slice k's files into `inDir` and run
    * `afterEach(k)` (the caller's `processAllAvailable` drain).
    */
  def stageBatches(df: DataFrame, batchCol: Column, n: Int, inDir: String)(
      afterEach: Int => Unit): Unit = {
    val stage = Files.createTempDirectory("graft-stage")
    try {
      df.withColumn("__b", batchCol.cast("int"))
        .write.partitionBy("__b").parquet(stage.resolve("d").toString)
      (0 until n).foreach { k =>
        val d = stage.resolve("d").resolve(s"__b=$k")
        if (Files.isDirectory(d)) {
          import scala.jdk.CollectionConverters._
          val files = Files.list(d).iterator().asScala.toSeq
            .filter(_.getFileName.toString.endsWith(".parquet"))
          files.foreach { f =>
            Files.move(f, Paths.get(inDir, s"b${k}_${f.getFileName}"))
          }
        }
        afterEach(k)
      }
    } finally graft.SparkEntry.rmrf(stage.toString)
  }
}
