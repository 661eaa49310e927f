package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.GraftLake

/** st17: the production landing shape for streaming aggregates —
  * EVENT-TIME windowed aggregation under a watermark, APPEND output
  * mode (only FINALIZED windows ever emit, each exactly once), landed
  * into a lake table with idempotent epoch tags. This is the
  * "aggregate once, land immutably" pipeline every metrics warehouse
  * runs; retract-mode folds (mv03/st10) are the OTHER shape, where
  * windows may keep updating after they land.
  *
  * Mechanics under test:
  *  - `withWatermark("ts", 1 hour)` + `window(ts, 1 hour)` + append
  *    mode: Spark holds each window open until the watermark passes
  *    its end, then emits it in exactly one micro-batch — so every
  *    lake append is a set of windows that can NEVER change again
  *    (immutable-by-construction files, no compaction debt).
  *  - The driver feeds micro-batches in event-time order (tertile
  *    splits), so the watermark actually advances per batch the way
  *    a live stream's does.
  *  - A single far-future SENTINEL row closes the tail: its event
  *    time pushes the watermark past every real window, flushing
  *    them; the sentinel's own (still-open) window stays in state and
  *    never lands — the gate filters nothing, because an open window
  *    is never emitted in append mode.
  *  - Exactly-once: `foreachBatch` + [[GraftLake.appendIdempotent]]
  *    keyed on the batch id; a replayed epoch is a no-op (proven
  *    in-result via the replay flag).
  *
  * At 100 TB the scale story is the watermark's: state is
  * O(open windows × types), emission is O(finalized windows) per
  * batch, and the lake receives append-only immutable files — no
  * read-modify-write anywhere.
  */
object WatermarkLake {

  val SentinelType = "__wm_flush__"

  def st17WatermarkLakeAppend(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.SparkEntry.scratch("graft_wm_lake", dir)
    graft.SparkEntry.rmrf(path)
    val events = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value"))

    // Event-time halves, so each staged batch advances the watermark
    // like a live stream would (each micro-batch costs a state-store
    // commit — two real batches + the sentinel keep the fixed
    // overhead minimal while still exercising mid-stream finalization).
    val mm = events.agg(
      min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts")))).head
    val (t0, t1) = (mm.getLong(0), mm.getLong(1))
    val cut1 = t0 + (t1 - t0) / 2

    val base = java.nio.file.Files.createTempDirectory("graft-st17")
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val ckDir = base.resolve("ck").toString

    val agg = spark.readStream.schema(events.schema).parquet(inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // Exact cents (see q01): windowed money sums are the same
      // order-dependent float family as the batch ones.
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

    // The landing table must exist before the first epoch commits.
    GraftLake.create(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        agg.schema), path)

    // The windowed-agg state store instantiates one partition per
    // shuffle partition and commits EVERY one each micro-batch; the
    // state here is O(windows × types) rows, so a quarter of the
    // session's shuffle setting holds it comfortably and cuts the
    // per-batch commit fan-out 4× — DERIVED from the session, never a
    // literal, so state parallelism scales with the cluster. Read at
    // query START, so the temporary setting scopes to this stream only.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(1, prevParts.toInt / 4).toString)
    val q =
      try {
        agg.writeStream
          .option("checkpointLocation", ckDir)
          .outputMode("append") // ONLY finalized windows — the contract
          .foreachBatch { (finalized: DataFrame, batchId: Long) =>
            if (!finalized.isEmpty) {
              GraftLake.appendIdempotent(finalized, path, s"epoch-$batchId")
            }
            ()
          }
          .start()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
    try {
      Staging.stageBatches(events,
        when(unix_timestamp(col("ts")) <= cut1, 0).otherwise(1),
        2, inDir) { _ =>
        q.processAllAvailable()
      }
      // The sentinel closes the tail: one far-future row whose event
      // time drags the watermark past every real window.
      import spark.implicits._
      Seq((new java.sql.Timestamp((t1 + 10 * 86400) * 1000L),
        SentinelType, 0.0)).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      // Watermark-driven finalization may land in a no-data batch
      // scheduled AFTER the sentinel's own: drain it too.
      q.processAllAvailable()
    } finally {
      q.stop()
      graft.SparkEntry.rmrf(base.toString)
    }

    // Restart replay: a landed epoch tag must not double-land.
    val before = GraftLake.latestVersion(path)
    val firstTag = GraftLake.snapshot(path).tags.keys.toSeq.sorted.head
    GraftLake.appendIdempotent(
      GraftLake.read(spark, path).limit(1), path, firstTag)
    val replaySkipped = GraftLake.latestVersion(path) == before

    GraftLake.read(spark, path)
      .withColumn("append_exactly_once", lit(replaySkipped))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Batch replay: every hourly window over the full event set —
    * append mode must have landed each exactly once, none missing,
    * none duplicated (the sentinel's window never finalizes and so
    * never lands).
    */
  val st17OracleSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n,
      |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
      |  TRUE AS append_exactly_once
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin
}
