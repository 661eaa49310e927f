package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Drives the real file-based Structured Streaming path (readStream →
  * transform → writeStream file sink), complementing the MemoryStream
  * specs.
  */
class FileStreamSpec extends AnyFunSuite with SparkSpec {

  test("parquet file stream -> watermarked windowed counts -> parquet sink") {
    val base = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"

    // Stage the batch events as the stream input (one file = one batch).
    val events = Tables.events(spark, sf)
    events.write.parquet(inDir)
    val schema = events.schema

    val streamed = spark.readStream.schema(schema).parquet(inDir)
      .withWatermark("ts", "2 hours")
    val counts = EventStreams.windowedCounts(streamed)

    val q = counts.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(outDir)
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    val want = EventStreams.windowedCounts(events)
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    // Append mode only emits windows closed by the watermark; all but
    // the trailing windows must match the batch result exactly.
    assert(got.nonEmpty)
    assert(got.forall(want.contains))
    assert(got.size >= want.size - 8) // open tail windows may be held back
  }
}
