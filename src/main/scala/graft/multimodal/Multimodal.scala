package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2: m01).
  *
  * Media is modeled as an opaque `binary` column + typed metadata —
  * the pattern a 100 TB training-data pipeline uses for image/audio/
  * video payloads. The Spark-side plumbing (schema, partition-parallel
  * batch iteration via mapPartitions, typed output) is real; the codec
  * itself is a STUB (no image/audio libs in this container): header
  * fields are derived deterministically from the leading payload bytes
  * so results are reproducible and testable.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, feat_sum: Long)

  /** STUB decoder — stands in for a real image codec. Reads "header"
    * bytes and a whole-payload checksum feature; replace the body with
    * a real decode (JPEG dims, EXIF, etc.) when codecs are available.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    MediaMeta(id, bytes.length, (b0 % 64) + 1, (b1 % 64) + 1, 3, s % 997)
  }

  /** m01: binary payload -> typed media metadata.
    * mapPartitions keeps the decode batch-shaped (one iterator per
    * partition — codec init amortized across the partition, the same
    * shape a vectorized/Arrow UDF would have).
    */
  /** Decoded metadata, unsorted — the composable internal form (no
    * global sort; downstream operators pay ordering only at their own
    * output surface).
    */
  private def decodedMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  def m01MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodedMeta(spark, dir).orderBy("doc_id")

  case class ResizedMeta(
      doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, scale_x: Double, scale_y: Double)

  /** m02: resize planning — STUB for the pixel resample (real codecs
    * would transform the payload); emits the aspect-preserving target
    * geometry per media item. Runs on m01's decoded metadata.
    */
  def m02Resize(spark: SparkSession, dir: String, target: Int = 32): DataFrame = {
    import spark.implicits._
    decodedMeta(spark, dir)
      .select(col("doc_id"), col("width"), col("height"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        val s = target.toDouble / math.max(w, h)
        ResizedMeta(id, w, h,
          math.max(1, math.round(w * s).toInt),
          math.max(1, math.round(h * s).toInt),
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF()
      .orderBy("doc_id")
  }

  case class FrameSample(
      doc_id: Long, n_frames: Int, n_sampled: Int, first_checksum: Long)

  /** m03: frame sampling — treats the payload as fixed-size frames
    * (video analog) and keeps every `stride`-th frame; decode is the
    * same STUB boundary. Per-row O(bytes), partition-parallel.
    */
  def m03FrameSample(
      spark: SparkSession, dir: String,
      frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val frames = bytes.grouped(frameBytes).toArray
        val sampled = frames.zipWithIndex.collect {
          case (f, i) if i % stride == 0 => f
        }
        val checksum =
          if (sampled.isEmpty) 0L
          else sampled.head.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        FrameSample(id, frames.length, sampled.length, checksum)
      })
      .toDF()
      .orderBy("doc_id")
  }
}
