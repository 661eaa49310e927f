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

  test("st17: late rows beyond the watermark are dropped; finalized windows land exactly once") {
    import spark.implicits._
    import graft.sources.GraftLake
    val base = Files.createTempDirectory("graft-st17-late").toString
    val inDir = s"$base/in"
    val ckDir = s"$base/ck"
    val lake = s"$base/lake"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val schema = Seq((ts(0), "a", 1.0)).toDF("ts", "event_type", "value").schema

    val agg = spark.readStream.schema(schema).parquet(inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
    val q = agg.writeStream
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) { GraftLake.appendIdempotent(b, lake, s"e$id"); () }
      }
      .start()
    try {
      // Batch 1: two on-time rows in hour 0 and one in hour 5 —
      // watermark after this batch = 05:00 - 1h = 04:00, so hour 0
      // finalizes (and lands) on the next trigger.
      Seq((ts(0, 10), "a", 1.0), (ts(0, 40), "a", 1.0), (ts(5), "b", 1.0))
        .toDF("ts", "event_type", "value").write.mode("append").parquet(inDir)
      q.processAllAvailable()
      // Batch 2: a LATE row for hour 0 — beyond the watermark, its
      // window already finalized: append mode must DROP it, plus a
      // far-future row to flush everything real.
      Seq((ts(0, 50), "a", 1.0), (ts(23), "c", 1.0))
        .toDF("ts", "event_type", "value").write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()

    val got = GraftLake.read(spark, lake).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // Hour 0 landed with n=2 (late row dropped, window immutable);
    // hour 5 flushed by the far-future row; hour 23 never finalized.
    assert(got == Set((ts(0), "a", 2L), (ts(5), "b", 1L)))
  }

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
