package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Streaming ingest curation over the documents corpus — the
  * continuous version of the batch cleanup passes (d23 quality gate +
  * d01 exact dedup): as documents arrive, drop the ones that fail the
  * quality rules, collapse exact duplicates, and maintain per-language
  * corpus statistics.
  *
  * One transform serves batch and streaming (the Structured Streaming
  * contract): the quality rules are pure Column expressions (codegen'd,
  * no state), dedup is keyed on (lang, content-hash) — in streaming
  * that key bounds `dropDuplicates` state, and a production deployment
  * adds an ingest-time watermark (`dropDuplicatesWithinWatermark`) so
  * the state ages out; the corpus here has no event-time column.
  */
object DocStreams {

  /** Quality-kept documents with their content hash and token count.
    * Rules are the word-count floor and stopword-ratio floor of d23 —
    * integer arithmetic only, so the decision replays engine-portably.
    *
    * ONE typed tokenization pass (streaming-compatible): the HOF
    * Column form evaluated split() once per referencing expression
    * (the CollapseProject inlining d21 documents) — 2x the dominant
    * cost of this transform at corpus scale.
    */
  def curate(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val stops = graft.operators.TextCorpus.FilterStopwords.toSet
    docs.select(col("lang"), col("text")).as[(String, String)]
      .map { case (lang, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        (lang, text, ws.length, ws.count(stops.contains))
      }
      .toDF("lang", "text", "n_words", "n_stop")
      .filter(col("n_words") >= 25 && col("n_stop") * 100 >= col("n_words") * 5)
      .select(col("lang"), md5(col("text")).as("h"), col("n_words"))
  }

  /** Exact dedup on (lang, content-hash) — the same call works in both
    * modes (streaming keeps per-key state; batch plans an aggregate).
    * Identical text ⇒ identical n_words, so the arbitrary surviving
    * representative is still deterministic at the aggregate level.
    */
  def dedupCurated(curated: DataFrame): DataFrame =
    curated.dropDuplicates("lang", "h")

  /** Per-language curated-corpus statistics: distinct kept documents
    * and their total token mass. Group keys are (lang) after a
    * (lang, h)-keyed dedup — both aggs partial-aggregate, and in
    * streaming the same plan runs in update mode over the dedup state.
    */
  def langStats(deduped: DataFrame): DataFrame =
    deduped
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_unique"), sum(col("n_words")).as("sum_words"))

  /** st08 (oracle-checked in batch; streaming == batch in the spec). */
  def st08StreamCurate(spark: SparkSession, dir: String): DataFrame =
    langStats(dedupCurated(curate(Tables.documents(spark, dir))))
      .orderBy("lang")
}
