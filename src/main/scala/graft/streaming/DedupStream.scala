package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup
import graft.sources.GraftLake

/** st18: STREAMING NEAR-DUP CURATION against an accumulating lake
  * band index — the production shape of continuous corpus ingestion
  * for LLM training data: documents arrive in micro-batches, each
  * batch exact-dedups within itself, then drops every doc whose
  * MinHash band collides with ANY previously-accepted document, and
  * the survivors' bands join the index — so the filter's knowledge
  * grows monotonically with the corpus, never rescanned.
  *
  * Semantics (deterministic, so the oracle can replay them):
  *  - arrival batches are the `doc_id % 3` classes, staged in order;
  *  - within a batch, exact dedup on the NORMALIZED text
  *    (lower/trim), smallest doc_id wins;
  *  - across batches, a doc is dropped iff it shares ≥1 LSH band
  *    bucket with an already-accepted survivor (d06's banding: 32
  *    permutations, 8 bands of 4 rows) — near-dup pairs agree on a
  *    band with the standard S-curve probability, and identical docs
  *    ALWAYS collide (identical signatures);
  *  - both appends (survivor rows, index rows) are epoch-tagged
  *    exactly-once.
  *
  * Scale: per batch the work is O(|batch|) signature computation +
  * one keyed join of the batch's band rows against the index — the
  * index is a lake table with (band_idx, band_hash) as join key, so
  * the probe is an equi-join, never a pairwise comparison; the
  * accepted corpus is never rescanned. State lives in the LAKE, not
  * the stream (restart-safe by construction, no state store to
  * migrate). At 100 TB the index is the only growing structure and
  * it is O(accepted docs × bands) rows of three longs.
  */
object DedupStream {

  def st18StreamNearDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.SparkEntry.scratch("graft_stream_corpus", dir)
    val index = graft.SparkEntry.scratch("graft_stream_bandidx", dir)
    graft.SparkEntry.rmrf(corpus)
    graft.SparkEntry.rmrf(index)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    val base = java.nio.file.Files.createTempDirectory("graft-st18")
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val ckDir = base.resolve("ck").toString

    val q = spark.readStream.schema(docs.schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        // 1. exact dedup within the batch: first doc_id per
        //    normalized text (one keyed window, no self-join).
        val w = Window.partitionBy(lower(trim(col("text"))))
          .orderBy(col("doc_id"))
        val uniq = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        // 2. near-dup probe: batch band rows vs the index — one
        //    equi-join on (band_idx, band_hash); any hit drops the doc.
        val bands = Dedup.bandRowsOf(uniq)
        val survivors =
          if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(index, "_graft_log"))) uniq
          else {
            val hit = bands
              .join(GraftLake.read(spark, index),
                Seq("band_idx", "band_hash"), "left_semi")
              .select(col("doc_id")).distinct()
            uniq.join(hit, Seq("doc_id"), "left_anti")
          }
        // 3. exactly-once landings: survivors + their index rows.
        //    localCheckpoint: both appends consume `survivors`, and the
        //    second must not recompute it AFTER the index grew.
        val s = survivors.select(col("doc_id"), col("text")).localCheckpoint(true)
        GraftLake.appendIdempotent(
          s.select(col("doc_id")), corpus, s"corpus-epoch-$batchId")
        GraftLake.appendIdempotent(
          Dedup.bandRowsOf(s), index, s"index-epoch-$batchId")
        ()
      }
      .start()
    try {
      Staging.stageBatches(docs, pmod(col("doc_id"), lit(3)), 3, inDir) { _ =>
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      graft.SparkEntry.rmrf(base.toString)
    }

    // Epoch replay must be a no-op on BOTH tables.
    val (vc, vi) = (GraftLake.latestVersion(corpus), GraftLake.latestVersion(index))
    GraftLake.appendIdempotent(
      GraftLake.read(spark, corpus).limit(1), corpus, "corpus-epoch-0")
    GraftLake.appendIdempotent(
      GraftLake.read(spark, index).limit(1), index, "index-epoch-0")
    val exactlyOnce = GraftLake.latestVersion(corpus) == vc &&
      GraftLake.latestVersion(index) == vi

    GraftLake.read(spark, corpus)
      .select(col("doc_id"), pmod(col("doc_id"), lit(3)).cast("int").as("arrived_batch"))
      .withColumn("exactly_once", lit(exactlyOnce))
      .orderBy(col("doc_id"))
  }

  /** Replays the three arrival batches over the shared band CTE
    * chain: batch-0 survivors are the in-batch exact-dedup winners;
    * later batches additionally require NO band-bucket collision with
    * any EARLIER survivor's bands — the unrolled fold of the stream's
    * accumulating index.
    */
  val st18OracleSql: String = {
    def exact(k: Int) =
      s"""x$k AS MATERIALIZED (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY s ORDER BY doc_id) AS rn
         |    FROM t WHERE doc_id % 3 = $k) WHERE rn = 1)""".stripMargin
    s"""WITH
       |${Dedup.minhashBandRowsSql},
       |${exact(0)},
       |s0 AS MATERIALIZED (SELECT doc_id FROM x0),
       |i0 AS MATERIALIZED (
       |  SELECT e.band_idx, e.band_hash FROM e JOIN s0 USING (doc_id)),
       |${exact(1)},
       |s1 AS MATERIALIZED (
       |  SELECT d.doc_id FROM x1 d
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM e x JOIN i0 i
       |      ON x.band_idx = i.band_idx AND x.band_hash = i.band_hash
       |    WHERE x.doc_id = d.doc_id)),
       |i1 AS MATERIALIZED (
       |  SELECT band_idx, band_hash FROM i0
       |  UNION ALL
       |  SELECT e.band_idx, e.band_hash FROM e JOIN s1 USING (doc_id)),
       |${exact(2)},
       |s2 AS MATERIALIZED (
       |  SELECT d.doc_id FROM x2 d
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM e x JOIN i1 i
       |      ON x.band_idx = i.band_idx AND x.band_hash = i.band_hash
       |    WHERE x.doc_id = d.doc_id)),
       |surv AS (SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM s1
       |         UNION ALL SELECT doc_id FROM s2)
       |SELECT doc_id, CAST(doc_id % 3 AS INT) AS arrived_batch,
       |  TRUE AS exactly_once
       |FROM surv ORDER BY doc_id""".stripMargin
  }
}
