package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Analytics

/** st16: STREAMING anomaly detection — q71's exact-integer 2σ spike
  * test maintained continuously (SURVEY.md §2).
  *
  * The split that makes it streamable: the per-(type, day) cents
  * totals are ADDITIVE state (partials from any batch split merge by
  * summation — the same algebra mv01/mv03 fold), while the flag pass
  * is a recompute over that O(types × days) table, not over events.
  * Each micro-batch therefore costs O(delta) to fold plus O(days)
  * to re-flag — at 100 TB the event stream is touched exactly once
  * per row, and "which days are outliers" can be re-answered after
  * every batch (anomaly thresholds legitimately move as history
  * accumulates — a day can become anomalous retroactively, which the
  * maintained-table shape models and a per-row streaming filter
  * cannot).
  *
  * The gate drives a REAL file-source micro-batch stream over three
  * time-thirds of the events table; the oracle is q71's — streaming
  * maintenance must land on the identical flag set.
  */
object AnomalyStream {

  /** Fold a batch's day totals into the maintained table. */
  def mergeDaily(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("x")).as("x"))

  def st16StreamAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    if (events.isEmpty) return Analytics.anomalyFrom(Analytics.dailyCents(events))
    val base = java.nio.file.Files.createTempDirectory("graft-st16")
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val q = spark.readStream.schema(events.schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = Analytics.dailyCents(batch.localCheckpoint(true))
        state.getAndUpdate {
          case null => d.localCheckpoint(true)
          case v => mergeDaily(v, d).localCheckpoint(true)
        }
        ()
      }
      .outputMode("append").start()
    try {
      // Three ABSOLUTE-time thirds (any date span), one micro-batch
      // each — mid-series batches see genuinely partial days.
      val bounds = events.agg(
        min(col("ts")).cast("long"), max(col("ts")).cast("long")).head
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
      Staging.stageBatches(events,
        when(col("ts").cast("long") <= c1, 0)
          .when(col("ts").cast("long") <= c2, 1).otherwise(2), 3, inDir) { _ =>
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Analytics.anomalyFrom(state.get()).localCheckpoint(true)
  }

  /** Streaming maintenance lands on the batch flag set exactly. */
  val st16OracleSql: String = Analytics.q71OracleSql
}
