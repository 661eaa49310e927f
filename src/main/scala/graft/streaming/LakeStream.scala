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
      Staging.stageBatches(orders,
        pmod(col("o_orderkey"), lit(3)), 3, inDir) { _ =>
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

  /** st12: STREAMING READ from the lake (SURVEY.md §2) — the
    * [[graft.sources.LakeStreamSource]] tails the commit log: create
    * the table (v0), start the stream, append two more year-slices
    * MID-STREAM (v1, v2), and fold every micro-batch's rows (tagged
    * `_commit_version`) into per-commit aggregates. The oracle replays
    * the three year splits from raw orders — green means the tail
    * delivered every commit's rows exactly once, whatever the
    * micro-batch boundaries were.
    */
  def st12LakeStreamRead(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.SparkEntry.scratch("graft_lake_tail", dir)
    graft.SparkEntry.rmrf(path)
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderdate"))
    val y = year(col("o_orderdate"))
    def slice(pred: org.apache.spark.sql.Column): DataFrame =
      orders.filter(pred).drop("o_orderdate")
    GraftLake.create(slice(y.isNull || y < 1998), path) // v0

    val base = java.nio.file.Files.createTempDirectory("graft-st12")
    val ckDir = base.resolve("ck").toString
    val outDir = base.resolve("out").toString
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", path).load()
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
        ()
      }
      .outputMode("append").start()
    try {
      q.processAllAvailable()                    // micro-batch 1: v0
      GraftLake.append(slice(y === 1998), path)  // v1, mid-stream
      q.processAllAvailable()
      GraftLake.append(slice(y > 1998), path)    // v2, mid-stream
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    val out = spark.read.parquet(outDir)
      .groupBy(col("_commit_version").as("commit_version"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy(col("commit_version"), col("o_orderstatus"))
      .localCheckpoint(true)
    graft.SparkEntry.rmrf(base.toString)
    out
  }

  /** st13: the COMPOSED incremental pipeline — lake → stream → lake.
    * A source table takes three commits; `graft-lake-stream` tails it
    * (st12's source), each micro-batch CURATES its delta (filter +
    * derived band) and lands it in a SECOND lake table via
    * exactly-once tagged appends (st10's sink). The curated table
    * must equal the one-shot batch transform of the source — proving
    * the incremental pipeline loses nothing and doubles nothing — and
    * an epoch replay after the stream is a proven no-op
    * (`replay_skipped`). This is the end-to-end shape a 100 TB
    * training-data refinery runs continuously: new raw commits flow
    * through curation into the refined table with per-commit
    * exactly-once semantics, no full rescans anywhere.
    */
  def st13LakePipeline(spark: SparkSession, dir: String): DataFrame = {
    val src = graft.SparkEntry.scratch("graft_lake_pipe_src", dir)
    val dst = graft.SparkEntry.scratch("graft_lake_pipe_dst", dir)
    graft.SparkEntry.rmrf(src)
    graft.SparkEntry.rmrf(dst)
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    def curate(df: DataFrame): DataFrame =
      df.filter(col("cents") >= 10000000L)
        .withColumn("band", expr("cents div 10000000"))
    GraftLake.create(orders.filter(col("o_orderkey") % 3 === 0), src)
    GraftLake.create(curate(orders).limit(0), dst)

    val base = java.nio.file.Files.createTempDirectory("graft-st13")
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", src).load()
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        GraftLake.appendIdempotent(
          curate(batch.drop("_commit_version")), dst, s"epoch-$batchId")
        ()
      }
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      GraftLake.append(orders.filter(col("o_orderkey") % 3 === 1), src)
      q.processAllAvailable()
      GraftLake.append(orders.filter(col("o_orderkey") % 3 === 2), src)
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    // Epoch replay against the curated table: tag already present.
    val before = GraftLake.latestVersion(dst)
    GraftLake.appendIdempotent(
      curate(orders.filter(col("o_orderkey") % 3 === 0)), dst, "epoch-0")
    val replaySkipped = GraftLake.latestVersion(dst) == before

    val out = GraftLake.read(spark, dst)
      .groupBy(col("o_orderstatus"), col("band"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("replay_skipped", lit(replaySkipped))
      .orderBy(col("o_orderstatus"), col("band"))
      .localCheckpoint(true)
    graft.SparkEntry.rmrf(base.toString)
    out
  }

  /** st14: the DSv2-NATIVE lake sink (SURVEY.md §2) — the same
    * exactly-once contract as st10, but through
    * `writeStream.format("graft-lake")` instead of `foreachBatch`:
    * executor tasks stage parquet part-files (rows never visit the
    * driver), the driver's epoch commit publishes ONE atomic tagged
    * log entry, and Spark's epoch replay hits the tag and becomes a
    * no-op ([[graft.sources.LakeSink]]). The in-row proofs:
    * `all_epoch_tagged` (every commit carries its sink epoch tag) and
    * `replay_skipped` (re-appending under an already-committed tag
    * does not advance the log). The aggregate must equal the batch
    * answer over all orders — the same oracle as st10.
    */
  def st14LakeSinkDsv2(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.SparkEntry.scratch("graft_lake_sinkv2", dir)
    graft.SparkEntry.rmrf(path)
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))

    val base = java.nio.file.Files.createTempDirectory("graft-st14")
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val q = spark.readStream.schema(orders.schema).parquet(inDir)
      .writeStream.format("graft-lake")
      .option("path", path)
      .option("checkpointLocation", base.resolve("ck").toString)
      .outputMode("append").start()
    try {
      Staging.stageBatches(orders,
        pmod(col("o_orderkey"), lit(3)), 3, inDir) { _ =>
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      graft.SparkEntry.rmrf(base.toString)
    }

    val cs = GraftLake.commits(path)
    val allTagged = cs.nonEmpty &&
      cs.forall(_.tag.exists(_.startsWith("graft-lake-sink-epoch-")))
    // Epoch replay: committing ANYTHING under an already-present tag
    // must be a no-op (tags dedup across every writer path).
    val before = GraftLake.latestVersion(path)
    GraftLake.appendIdempotent(orders.limit(10), path, cs.head.tag.get)
    val replaySkipped = GraftLake.latestVersion(path) == before

    GraftLake.read(spark, path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("replay_skipped", lit(replaySkipped && allTagged))
      .orderBy(col("o_orderstatus"))
  }

  /** Same shape and proof column as st10 — the sink changed, not the
    * semantics, so st10's oracle replays st14 too.
    */
  val st14OracleSql: String = st10OracleSql

  val st13OracleSql: String =
    """SELECT o_orderstatus,
      |  CAST(round(o_totalprice * 100) AS BIGINT) // 10000000 AS band,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      |  TRUE AS replay_skipped
      |FROM orders
      |WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 10000000
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** st15: streaming CDC-APPLY — the Kafka/Debezium→lakehouse shape:
    * an INSERT-ONLY changefeed table carries upsert RECORDS (later
    * record per key wins), a stream tails its commit log, and every
    * micro-batch lands in the materialized target as ONE exactly-once
    * tagged MERGE. The three legs each already exist (st12 tails,
    * merge upserts, tags dedup) — st15 proves they compose into the
    * continuously-maintained mirror table a warehouse calls "CDC
    * apply", with per-epoch exactly-once even across batch replays.
    *
    * Within a batch the LATEST record per key wins (one window over
    * the DELTA only — `_commit_version` descending), so coalesced
    * micro-batches apply the same final state as one-commit batches.
    * Scale: each apply is O(delta) + a zone-map-pruned merge — the
    * target never rescans, the feed never replays old commits.
    */
  def st15CdcApply(spark: SparkSession, dir: String): DataFrame = {
    val feed = graft.SparkEntry.scratch("graft_cdc_feed", dir)
    val dst = graft.SparkEntry.scratch("graft_cdc_dst", dir)
    graft.SparkEntry.rmrf(feed)
    graft.SparkEntry.rmrf(dst)
    val base0 = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val k = col("o_orderkey")
    // The changefeed: base records, then two update waves + inserts —
    // all derived arithmetically so the oracle replays the feed. The
    // insert offset must CLEAR the real key space at any SF (a fixed
    // constant collides with base keys once the table outgrows it,
    // double-counting in the UNION-ALL oracle while the keyed merge
    // correctly dedupes) — one bounded single-row agg derives it.
    val insOffset: Long =
      base0.agg(max(k)).head().getLong(0) + 1L
    val u1 = base0.filter(pmod(k, lit(7)) === 2)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("cents", col("cents") + 555)
    val u2 = base0.filter(pmod(k, lit(7)) === 5)
      .withColumn("o_orderstatus", lit("V"))
      .withColumn("cents", col("cents") + 777)
    val ins = base0.filter(pmod(k, lit(11)) === 3)
      .withColumn("o_orderkey", k + insOffset)
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("cents", col("cents") + 111)
    GraftLake.create(base0, feed)                    // feed v0
    GraftLake.create(base0.limit(0), dst, Some("o_orderkey"))

    val base = java.nio.file.Files.createTempDirectory("graft-st15")
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", feed).load()
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        // Latest record per key inside the delta (coalesced batches
        // may span several feed commits).
        val w = Window.partitionBy(col("o_orderkey"))
          .orderBy(col("_commit_version").desc)
        val latest = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn", "_commit_version")
        GraftLake.merge(spark, dst, latest, Seq("o_orderkey"),
          "o_orderkey", tag = Some(s"cdc-epoch-$batchId"))
        ()
      }
      .outputMode("append").start()
    try {
      q.processAllAvailable()                        // applies v0
      GraftLake.append(u1, feed)                     // feed v1
      q.processAllAvailable()
      GraftLake.append(u2.unionByName(ins), feed)    // feed v2
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    // Epoch replay: the same tag must not re-apply (merge is
    // exactly-once under its tag, like the append paths).
    val before = GraftLake.latestVersion(dst)
    val (_, rew, _) = GraftLake.merge(spark, dst, base0.limit(50),
      Seq("o_orderkey"), "o_orderkey", tag = Some("cdc-epoch-0"))
    val replaySkipped = GraftLake.latestVersion(dst) == before && rew == 0

    val out = GraftLake.read(spark, dst)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("replay_skipped", lit(replaySkipped))
      .orderBy(col("o_orderstatus"))
      .localCheckpoint(true)
    graft.SparkEntry.rmrf(base.toString)
    out
  }

  /** Replays the feed arithmetic: base minus updated keys, plus the
    * update waves and inserts — latest-wins by construction (the two
    * update key sets are disjoint mod-7 classes).
    */
  val st15OracleSql: String =
    """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      |final AS (
      |  SELECT k, st, c FROM base WHERE k % 7 <> 2 AND k % 7 <> 5
      |  UNION ALL
      |  SELECT k, 'U', c + 555 FROM base WHERE k % 7 = 2
      |  UNION ALL
      |  SELECT k, 'V', c + 777 FROM base WHERE k % 7 = 5
      |  UNION ALL
      |  SELECT k + (SELECT 1 + max(k) FROM base), 'N', c + 111
      |  FROM base WHERE k % 11 = 3)
      |SELECT st AS o_orderstatus, count(*) AS n,
      |  CAST(sum(c) AS BIGINT) AS cents,
      |  TRUE AS replay_skipped
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** st19: STREAMING CDF MIRROR — the end-to-end consumer the change
    * data feed exists for: a Structured Streaming query tails the
    * source lake table with `cdf=true` and maintains a MIRROR lake
    * table through every mutation kind (append, UPDATE, copy-on-write
    * DELETE, merge-on-read delete) — per micro-batch, the per-key
    * LATEST change wins (preimages sort below their postimages),
    * deleted keys apply through the distributed key-set delete
    * (anti-join, the delta never touches the driver) and surviving
    * images through the zone-pruned merge, BOTH exactly-once under
    * epoch tags. The gate pins mirror ≡ source in-row after all four
    * mutation kinds; the oracle replays the mutation arithmetic.
    *
    * At 100 TB this is Delta's CDF→MERGE replication loop: per batch
    * the work is O(changed rows) (sidecar scan + pruned rewrites),
    * never a source rescan, and restarts replay nothing (offsets are
    * commit versions; applies are tag-idempotent).
    */
  def st19StreamCdfApply(spark: SparkSession, dir: String): DataFrame = {
    val src = graft.SparkEntry.scratch("graft_cdfs_src", dir)
    val dst = graft.SparkEntry.scratch("graft_cdfs_dst", dir)
    graft.SparkEntry.rmrf(src)
    graft.SparkEntry.rmrf(dst)
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val k = col("o_orderkey")
    GraftLake.create(o.filter(pmod(k, lit(3)) < 2), src, Some("o_orderkey"))
    GraftLake.enableCdf(src)
    GraftLake.create(o.limit(0), dst, Some("o_orderkey"))
    val base = java.nio.file.Files.createTempDirectory("graft-st19")
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", src).option("cdf", "true").load()
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderkey"))
          .orderBy(col("_commit_version").desc,
            when(col("_change_type") === "update_preimage", 0)
              .otherwise(1).desc)
        val latest = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).localCheckpoint(true)
        GraftLake.deleteKeys(spark, dst,
          latest.filter(col("_change_type") === "delete")
            .select(col("o_orderkey")),
          "o_orderkey", Some("o_orderkey"), tag = Some(s"cdf-del-$batchId"))
        GraftLake.merge(spark, dst,
          latest.filter(col("_change_type") =!= "delete")
            .drop("rn", "_change_type", "_commit_version"),
          Seq("o_orderkey"), "o_orderkey", tag = Some(s"cdf-up-$batchId"))
        ()
      }
      .outputMode("append").start()
    try {
      q.processAllAvailable()                                      // v0 inserts
      GraftLake.append(o.filter(pmod(k, lit(3)) === 2), src,
        statsCol = Some("o_orderkey"))                             // v1
      q.processAllAvailable()
      GraftLake.update(spark, src, pmod(k, lit(7)) === 2,
        Seq("cents" -> (col("cents") * 3)), Some("o_orderkey"))    // v2
      q.processAllAvailable()
      GraftLake.delete(spark, src, pmod(k, lit(5)) === 4,
        Some("o_orderkey"))                                        // v3
      q.processAllAvailable()
      GraftLake.deleteMoR(spark, src, pmod(k, lit(11)) === 7,
        "o_orderkey")                                              // v4
      q.processAllAvailable()
    } finally q.stop()
    val srcDf = GraftLake.read(spark, src)
    val dstDf = GraftLake.read(spark, dst)
    // Tagged-union (count, xxhash64-sum) multiset signature — ONE
    // execution covers both sides (SparkEntry.multisetEqual).
    val same = graft.SparkEntry.multisetEqual(dstDf, srcDf)
    dstDf.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("mirror_equals_source", lit(same))
      .orderBy(col("o_orderstatus"))
  }

  /** st20: STREAM ⋈ LAKE DIM under dimension CHANGE — the lakehouse
    * enrichment loop: a fact stream (lake tail) joins per micro-batch
    * against the CURRENT snapshot of a lake dimension, and the dim
    * takes a MERGE between fact waves — wave-1 facts enrich under the
    * old dim version, wave-2 under the new (reading the dim INSIDE
    * `foreachBatch` re-resolves the snapshot per batch; a static
    * DataFrame join would freeze the dim at stream start, the classic
    * stale-dimension bug). Batch boundaries are commit-deterministic
    * (`processAllAvailable` between waves), so the oracle replays the
    * wave arithmetic exactly. The dim is broadcast-sized (O(statuses)
    * rows) — at 100 TB the per-batch dim read stays a metadata-cheap
    * broadcast while facts stream through.
    */
  def st20StreamDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val facts = graft.SparkEntry.scratch("graft_st20_facts", dir)
    val dim = graft.SparkEntry.scratch("graft_st20_dim", dir)
    val out = graft.SparkEntry.scratch("graft_st20_out", dir)
    Seq(facts, dim, out).foreach(graft.SparkEntry.rmrf)
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val k = col("o_orderkey")
    import spark.implicits._
    val statuses = o.select(col("o_orderstatus")).distinct()
      .collect().map(_.getString(0)).sorted // O(|statuses|) metadata
    GraftLake.create(
      statuses.zipWithIndex.map { case (st, i) => (st, (i + 1) * 100L) }
        .toSeq.toDF("o_orderstatus", "bonus"),
      dim, None)
    GraftLake.create(o.filter(pmod(k, lit(2)) === 0), facts)       // wave 1
    val base = java.nio.file.Files.createTempDirectory("graft-st20")
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", facts).load()
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Fresh dim SNAPSHOT per batch — the whole point.
        val d = GraftLake.read(spark, dim)
        GraftLake.appendIdempotent(
          batch.drop("_commit_version")
            .join(broadcast(d), Seq("o_orderstatus"))
            .withColumn("cents", col("cents") + col("bonus"))
            .drop("bonus"),
          out, tag = s"st20-$batchId")
        ()
      }
      .outputMode("append").start()
    try {
      q.processAllAvailable()                                      // wave 1 joins old dim
      GraftLake.merge(spark, dim,                                  // dim changes
        statuses.zipWithIndex.map { case (st, i) => (st, (i + 1) * 1000L) }
          .toSeq.toDF("o_orderstatus", "bonus"),
        Seq("o_orderstatus"), "bonus")
      GraftLake.append(o.filter(pmod(k, lit(2)) === 1), facts)     // wave 2
      q.processAllAvailable()
    } finally q.stop()
    GraftLake.read(spark, out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Wave replay: even keys get the old (i+1)*100 bonus, odd keys the
    * merged (i+1)*1000 — i = the status's rank in sorted order.
    */
  val st20OracleSql: String =
    """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |d AS (SELECT st, row_number() OVER (ORDER BY st) AS i
      |  FROM (SELECT DISTINCT o_orderstatus AS st FROM orders)),
      |f AS (
      |  SELECT o.k, o.st,
      |    o.cents + CASE WHEN o.k % 2 = 0 THEN d.i * 100
      |                   ELSE d.i * 1000 END AS cents
      |  FROM o JOIN d ON o.st = d.st)
      |SELECT st AS o_orderstatus, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  val st19OracleSql: String =
    """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |f AS (SELECT k, st,
      |    CASE WHEN k % 7 = 2 THEN cents * 3 ELSE cents END AS cents
      |  FROM o WHERE k % 5 <> 4 AND k % 11 <> 7)
      |SELECT st AS o_orderstatus, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS cents, TRUE AS mirror_equals_source
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** st21: STREAMING UPSERT VIA DELETION VECTORS — the high-frequency
    * CDC-apply loop mergeDv exists for: a stream of change batches
    * upserts into a lake table through [[GraftLake.mergeDv]], each
    * micro-batch committing ONE position sidecar + one appended set —
    * ZERO bytes of the seeded base sets are ever rewritten, across
    * every batch (st15's copy-on-write merge rewrites each hit set
    * per wave; here the base files are byte-identical at stream end).
    * Sidecars stack batch over batch with no inter-batch compact;
    * per-batch epoch tags make restarts exactly-once; one final
    * compact materializes everything. In-row flags pin zero-rewrite,
    * the skipped replay, and the compact round-trip.
    *
    * At 100 TB this is the continuous-ingest upsert shape: per batch
    * the write cost is O(changed rows) regardless of table size, and
    * the deferred rewrite amortizes into one scheduled OPTIMIZE
    * instead of per-batch file churn.
    */
  def st21StreamUpsertDv(spark: SparkSession, dir: String): DataFrame = {
    val feed = graft.SparkEntry.scratch("graft_st21_feed", dir)
    val dst = graft.SparkEntry.scratch("graft_st21_dst", dir)
    Seq(feed, dst).foreach(graft.SparkEntry.rmrf)
    val base0 = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val k = col("o_orderkey")
    val insOffset: Long = base0.agg(max(k)).head().getLong(0) + 1L
    val u1 = base0.filter(pmod(k, lit(7)) === 2)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("cents", col("cents") + 555)
    val u2ins = base0.filter(pmod(k, lit(7)) === 5)
      .withColumn("o_orderstatus", lit("V"))
      .withColumn("cents", col("cents") + 777)
      .unionByName(base0.filter(pmod(k, lit(11)) === 3)
        .withColumn("o_orderkey", k + insOffset)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("cents", col("cents") + 111))
    // The table under upsert: the full base, whose file sets must
    // survive the entire stream BY REFERENCE.
    GraftLake.create(base0, dst, Some("o_orderkey"))
    val liveBefore = GraftLake.snapshot(dst).live.map(_.set).toSet
    GraftLake.create(u1, feed)                       // feed v0
    val base = java.nio.file.Files.createTempDirectory("graft-st21")
    val q = spark.readStream.format("graft-lake-stream")
      .option("path", feed).load()
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        // Latest record per key inside the delta (coalesced batches
        // may span several feed commits).
        val w = Window.partitionBy(col("o_orderkey"))
          .orderBy(col("_commit_version").desc)
        val latest = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn", "_commit_version")
        GraftLake.mergeDv(spark, dst, latest, Seq("o_orderkey"),
          "o_orderkey", tag = Some(s"st21-epoch-$batchId"))
        ()
      }
      .outputMode("append").start()
    try {
      q.processAllAvailable()                        // wave 1: updates only
      GraftLake.append(u2ins, feed)                  // feed v1
      q.processAllAvailable()                        // wave 2: updates + inserts
    } finally q.stop()
    val snapAfter = GraftLake.snapshot(dst)
    // Zero rewrite across the whole stream: the seeded sets are all
    // still live and each wave added exactly (sidecar, data set).
    val zeroRewrite =
      liveBefore.subsetOf(snapAfter.live.map(_.set).toSet) &&
        snapAfter.live.size == liveBefore.size + 2 &&
        snapAfter.tombstones.size == 2
    // Epoch replay: the same tag must not re-apply.
    val before = GraftLake.latestVersion(dst)
    val (_, rem, _) = GraftLake.mergeDv(spark, dst, u1.limit(50),
      Seq("o_orderkey"), "o_orderkey", tag = Some("st21-epoch-0"))
    val replaySkipped = GraftLake.latestVersion(dst) == before && rem == 0
    val sumBefore = GraftLake.read(spark, dst)
      .agg(sum(col("cents"))).head.getLong(0)
    GraftLake.compact(spark, dst, Seq("o_orderkey"), numFiles = 4,
      Some("o_orderkey"))
    val cleared = GraftLake.snapshot(dst).tombstones.isEmpty
    val stable = GraftLake.read(spark, dst)
      .agg(sum(col("cents"))).head.getLong(0) == sumBefore
    val out = GraftLake.read(spark, dst)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("updv_stream_ok",
        lit(zeroRewrite && replaySkipped && cleared && stable))
      .orderBy(col("o_orderstatus"))
      .localCheckpoint(true)
    graft.SparkEntry.rmrf(base.toString)
    out
  }

  /** Replays the wave arithmetic: base minus the two updated mod-7
    * classes, plus the update waves and the offset inserts.
    */
  val st21OracleSql: String =
    """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      |final AS (
      |  SELECT k, st, c FROM base WHERE k % 7 <> 2 AND k % 7 <> 5
      |  UNION ALL
      |  SELECT k, 'U', c + 555 FROM base WHERE k % 7 = 2
      |  UNION ALL
      |  SELECT k, 'V', c + 777 FROM base WHERE k % 7 = 5
      |  UNION ALL
      |  SELECT k + (SELECT 1 + max(k) FROM base), 'N', c + 111
      |  FROM base WHERE k % 11 = 3)
      |SELECT st AS o_orderstatus, count(*) AS n,
      |  CAST(sum(c) AS BIGINT) AS cents,
      |  TRUE AS updv_stream_ok
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  val st12OracleSql: String =
    """SELECT 0 AS commit_version, o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders WHERE o_orderdate IS NULL OR year(o_orderdate) < 1998
      |GROUP BY 2
      |UNION ALL
      |SELECT 1, o_orderstatus, count(*),
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |FROM orders WHERE year(o_orderdate) = 1998 GROUP BY 2
      |UNION ALL
      |SELECT 2, o_orderstatus, count(*),
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |FROM orders WHERE year(o_orderdate) > 1998 GROUP BY 2
      |ORDER BY commit_version, o_orderstatus""".stripMargin
}
