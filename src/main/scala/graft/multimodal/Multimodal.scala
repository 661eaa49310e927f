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
  def m01MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }
}
