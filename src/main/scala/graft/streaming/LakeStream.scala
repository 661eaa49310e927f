package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.GraftLake

/** Structured Streaming → GraftLake: the EXACTLY-ONCE sink
  * (SURVEY.md §2: st10).
  *
  * foreachBatch gives at-least-once delivery — a restarted query
  * re-runs its last unacknowledged epoch, and a plain parquet append
  * would double those rows. The lake's tagged commits turn that into
  * exactly-once: each epoch commits as `appendIdempotent(delta, path,
  * "epoch-<batchId>")`, and a replayed epoch finds its tag already in
  * the log and becomes a no-op. The check is race-safe (it re-runs
  * inside the O_EXCL-serialized claim loop), which is precisely the
  * transactional sink contract Delta's `txnAppId`/`txnVersion` offers.
  *
  * The gate REPLAYS an epoch after the stream finishes — calling the
  * same sink operation with the same tag — and proves in-row that the
  * log did not grow (`replay_skipped`) while the aggregate still
  * equals the batch answer over all orders.
  */
object LakeStream {

  def st10StreamToLake(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.SparkEntry.scratch("graft_lake_stream", dir)
    graft.SparkEntry.rmrf(path)
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    GraftLake.create(orders.limit(0), path)

    // Drive: the mv03 file-source pattern — three pmod thirds staged
    // as parquet, each arriving as its own micro-batch.
    val base = java.nio.file.Files.createTempDirectory("graft-st10")
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val ckDir = base.resolve("ck").toString
    val q = spark.readStream.schema(orders.schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (delta: DataFrame, batchId: Long) =>
        GraftLake.appendIdempotent(delta, path, s"epoch-$batchId")
        ()
      }
      .outputMode("append").start()
    try {
      (0 until 3).foreach { i =>
        orders.filter(pmod(col("o_orderkey"), lit(3)) === i)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      graft.SparkEntry.rmrf(base.toString)
    }

    // Simulate the restarted-query epoch replay: same data, same tag.
    val before = GraftLake.latestVersion(path)
    GraftLake.appendIdempotent(
      orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), path, "epoch-0")
    val replaySkipped = GraftLake.latestVersion(path) == before

    GraftLake.read(spark, path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("replay_skipped", lit(replaySkipped))
      .orderBy(col("o_orderstatus"))
  }

  val st10OracleSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      |  TRUE AS replay_skipped
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
}
