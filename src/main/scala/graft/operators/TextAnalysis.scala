package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Oracle-checked text-analysis queries over the documents table
  * (SURVEY.md §2: d01..d05). All pure Column expressions → full
  * codegen, scan-dominated at scale.
  */
object TextAnalysis {

  /** d01: exact dedup — group by normalized-content hash, keep min id. */
  def d01DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(fingerprint(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy(col("content_hash"))

  /** d02: token counting — whitespace and BPE-ish regex tokenizations. */
  def d02TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        tokenCountWs(col("text")).as("n_ws"),
        tokenCountBpe(col("text")).as("n_bpe"))
      .orderBy(col("doc_id"))

  /** d03: quality scoring from length / punctuation / stopword ratios. */
  def d03QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val words = tokenCountWs(col("text"))
    val nChars = length(col("text"))
    val punctRatio = round(punctCount(col("text")) * 1.0 / nChars, 4)
    val stopRatio = round(hitCount(tokens(col("text")), StopEn) * 1.0 / words, 4)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nChars.as("n_chars_text"),
        words.as("n_words"),
        punctRatio.as("punct_ratio"),
        stopRatio.as("stop_ratio"))
      .withColumn("quality",
        round(
          least(col("n_words") / 50.0, lit(1.0)) * 0.5
            + (lit(1.0) - col("punct_ratio")) * 0.3
            + col("stop_ratio") * 0.2,
          4))
      .orderBy(col("doc_id"))
  }

  /** d04: language ID — stopword-hit argmax with fixed priority
    * (en > de > fr > es, 'und' when no hits).
    */
  def d04LangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang"),
        hitCount(toks, StopEn).as("h_en"),
        hitCount(toks, StopDe).as("h_de"),
        hitCount(toks, StopFr).as("h_fr"),
        hitCount(toks, StopEs).as("h_es"))
      .withColumn("predicted",
        when(col("h_en") >= col("h_de") && col("h_en") >= col("h_fr")
          && col("h_en") >= col("h_es") && col("h_en") > 0, "en")
          .when(col("h_de") >= col("h_fr") && col("h_de") >= col("h_es")
            && col("h_de") > 0, "de")
          .when(col("h_fr") >= col("h_es") && col("h_fr") > 0, "fr")
          .when(col("h_es") > 0, "es")
          .otherwise("und"))
      .orderBy(col("doc_id"))
  }

  /** d05: document fingerprinting — md5 of normalized content plus a
    * 64-bit prefix form and the shingle count.
    */
  def d05Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val words = size(split(trim(col("text")), " "))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        substring(fingerprint(col("text")), 1, 16).as("fp64"),
        greatest(words - 2, lit(1)).as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Canonical text-cleaning pipeline: lowercase, strip everything
    * outside [a-z0-9 .,], collapse runs of whitespace, trim. Pure
    * codegen'd regex Column ops — scan-dominated at scale.
    */
  def normalized(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 .,]", ""),
      " +", " "))

  /** d11: text normalization — the standard pre-tokenization cleanup a
    * training-data pipeline applies corpus-wide; emits the cleaned-text
    * hash plus before/after lengths so the oracle checks the transform
    * without shipping full texts.
    */
  def d11Normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_raw"),
        length(normalized(col("text"))).as("n_clean"),
        md5(normalized(col("text"))).as("clean_hash"))
      .orderBy(col("doc_id"))

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val LongNumRe = "[0-9]{7,}"

  /** d12: PII scrubbing — redact email addresses and long digit runs
    * (simple, portable regexes: no lookaround, identical semantics in
    * Java regex and RE2), count what was redacted, and hash the
    * scrubbed text. The count columns make redaction auditable; at
    * corpus scale this is the pass that runs before any text leaves
    * the raw zone.
    */
  def d12PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    // Redaction order is emails first, then digit runs; n_longnums counts
    // on the email-scrubbed intermediate so the audit counts exactly the
    // [NUM] replacements actually made (a digit run inside an email
    // local-part is swallowed by [EMAIL], not double-counted here).
    val emailScrubbed = regexp_replace(lower(col("text")), EmailRe, "[EMAIL]")
    val scrubbed = regexp_replace(emailScrubbed, LongNumRe, "[NUM]")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_count(lower(col("text")), lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(emailScrubbed, lit(LongNumRe)).cast("int").as("n_longnums"),
        md5(scrubbed).as("scrubbed_hash"))
      .orderBy(col("doc_id"))
  }
}
