package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level text statistics for training-data curation
  * (SURVEY.md §2: d13..d15) — the passes that run AFTER per-doc
  * cleanup (d11/d12) and alongside dedup (d01/d06..): cross-document
  * boilerplate detection, within-document repetition scoring, and
  * TF-IDF salient-term extraction.
  *
  * All three are pure relational plans (explode → partial-agg groupBy →
  * equi-join), so every stage shuffles on a high-cardinality key
  * (sentence hash, (doc, word), word) and map-side combines — the
  * shapes that survive a 100 TB corpus.
  */
object TextCorpus {

  /** Distinct normalized sentences per document: (doc_id, h). */
  private def sentences(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("s"))
      .filter(length(trim(col("s"))) > 0)
      .select(col("doc_id"), md5(lower(trim(col("s")))).as("h"))
      .distinct()

  /** d13: cross-document boilerplate (paragraph/sentence dedup) — for
    * each document, how many of its distinct sentences also occur in at
    * least one OTHER document. High dup_ratio flags templated /
    * mirrored pages, the classic pre-training corpus pollution.
    *
    * Shape: explode to (doc, sentence-hash), per-hash distinct-doc
    * count (one shuffle on the hash), join back, per-doc agg. Never
    * pairwise: a sentence shared by k docs costs k rows, not k².
    */
  def d13ParagraphDedup(spark: SparkSession, dir: String): DataFrame = {
    // sents feeds BOTH the doc-frequency agg and the join-back; without
    // a checkpoint the explode+md5+distinct scan runs twice (same
    // pattern as Dedup's `sym`). A reliable checkpoint dir in production.
    val sents = sentences(spark, dir).localCheckpoint(true)
    val docFreq = sents.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs_with"))
    sents.join(docFreq, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_sents"),
        sum(when(col("n_docs_with") >= 2, 1).otherwise(0)).cast("int").as("n_shared"))
      .withColumn("dup_ratio", round(col("n_shared") * 1.0 / col("n_sents"), 4))
      .orderBy(col("doc_id"))
  }

  /** d14: within-document repetition scoring — max-word-frequency ratio
    * (repeated-phrase degeneracy signal) and type-token ratio (lexical
    * diversity). Low-TTR / high-repetition docs are the "aaaa aaaa"
    * degenerate pages a quality filter drops.
    */
  def d14Repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("f")).cast("int").as("n_words"),
        count(lit(1)).cast("int").as("n_types"),
        max(col("f")).cast("int").as("max_freq"))
      .withColumn("rep_ratio", round(col("max_freq") * 1.0 / col("n_words"), 4))
      .withColumn("ttr", round(col("n_types") * 1.0 / col("n_words"), 4))
      .orderBy(col("doc_id"))

  /** d15: TF-IDF salient terms — top 3 terms per document by
    * tf x (N / df), ties broken lexicographically.
    *
    * The idf factor is the UNLOGGED N/df variant: rational arithmetic
    * only (+,-,*,/ are IEEE-exact and engine-portable), so the oracle
    * ranks identically — ln() differs in the last ulp across libm
    * implementations and could flip near-tied ranks.
    *
    * The per-doc top-k window partitions by doc_id (high cardinality —
    * no skewed single-task sort), and df is a partial-agg groupBy on
    * the word, not a broadcast of the vocabulary.
    */
  /** d16: corpus n-gram statistics — top-20 word bigrams. The n-gram
    * language-model-style counts a data pipeline uses for boilerplate
    * lists, tokenizer corpus analysis, and quality heuristics.
    *
    * Typed pairing pass per document (a Catalyst lambda nest over
    * split() would re-tokenize per index — the CollapseProject/HOF
    * re-evaluation blowup), then a plain partial-agg count: shuffle is
    * O(distinct bigrams), and the global top-20 is a TakeOrdered, not
    * a full sort.
    */
  def d16NgramStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (_, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        if (ws.length < 2) Iterator.empty
        else ws.sliding(2).map(p => p(0) + " " + p(1))
      }
      .toDF("bg")
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bg"))
      .limit(20)
  }

  /** d17: benchmark-contamination check — which corpus documents share
    * winnowed rolling-hash fingerprints ([[Dedup.rollingFingerprints]])
    * with a benchmark set (here: doc_id < 50 plays the held-out eval
    * set). The canonical decontamination pass before training: n-gram
    * fingerprint overlap, not exact match, so paraphrase-adjacent
    * copies still hit.
    *
    * Shape: O(chars) fingerprint pass on both sides, equi-join on the
    * fingerprint (benchmark side is tiny → broadcast), per-doc count.
    * Never compares documents pairwise.
    */
  def d17Contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Fingerprint each side from a PRE-filtered scan: filtering doc_id
    // after one shared opaque flatMap would (a) block pushdown into the
    // parquet scan and (b) run the winnowing pass — the dominant cost —
    // over the WHOLE corpus once per branch. Split first, and the bench
    // side fingerprints only the tiny held-out set.
    def fingerprints(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          Dedup.rollingFingerprints(text).map(fp => (id, fp))
        }
        .toDF("doc_id", "fp")
    val benchFps = fingerprints(
      Tables.documents(spark, dir).filter(col("doc_id") < 50))
      .select(col("fp")).distinct()
    // fanOut the corpus side only: the winnowing flatMap is the
    // dominant cost and the bench scan is one partition; the filter
    // stays upstream so pushdown still reaches the scan.
    val corpus = fingerprints(Par.fanOut(
      Tables.documents(spark, dir).filter(col("doc_id") >= 50)
        .select(col("doc_id"), col("text"))))
    val hits = corpus.join(broadcast(benchFps), "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_shared_fp"))
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= 50)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared_fp"), lit(0)).as("n_shared_fp"),
        (coalesce(col("n_shared_fp"), lit(0)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** d18: stable train/val/test split — every document lands in a
    * split determined ONLY by its content hash (Horner base-131 mod p,
    * the same replayable hash family as d06), never by row order or
    * partitioning: 80/10/10 by hash bucket. The property that matters
    * at 100 TB: adding or removing documents never reshuffles the
    * split of any other document, and re-runs are bit-identical.
    */
  def d18StableSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bucket = (Dedup.polyHash(text.trim.toLowerCase) % 100L).toInt
        val split =
          if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
        (id, bucket, split)
      }
      .toDF("doc_id", "bucket", "split")
      .orderBy("doc_id")
  }

  /** d19: fuzzy near-match scoring — Levenshtein edit distance over
    * deterministic adjacent-id pairs (the d08 pattern), normalized by
    * the longer length. The verify primitive for fuzzy entity
    * resolution; at scale it runs only on candidate pairs from a
    * blocking stage (d06/d07-style), never all pairs — and ONLY on a
    * bounded prefix: the DP is O(len_a x len_b) per pair, so unbounded
    * document-length inputs are quadratic-cost landmines (measured
    * 12s vs 0.5s at sf0.1). Fuzzy matching keys/titles is what edit
    * distance is for; whole-document similarity is d06/d08's job.
    */
  val EditDistancePrefix = 256

  /** Classic unit-cost Levenshtein, two-row DP — O(min len) memory.
    * Matches Spark's `levenshtein` and DuckDB's `levenshtein` exactly
    * (the unambiguous textbook recurrence).
    */
  private[operators] def levenshteinDist(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  def d19EditDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(lower(trim(col("text"))), 1, EditDistancePrefix).as("s"))
    // fanOut the probe side: b broadcasts (tiny), so the O(len²) DP
    // map below inherits a's partitioning — one bench scan partition
    // without this (no-op at production scale).
    val a = Par.fanOut(
      docs.select(col("doc_id").as("doc_a"), col("s").as("s_a")))
    val b = docs.select((col("doc_id") - 1).as("doc_a"),
      col("doc_id").as("doc_b"), col("s").as("s_b"))
    // Typed pass so the O(len^2) DP runs ONCE per pair — as a Column
    // expression CollapseProject inlines it into both output columns
    // (2x the dominant cost, measured). Broadcast b explicitly so the
    // fanned-out a side is always the streamed side the DP map runs on
    // — but ONLY when the plan-time size estimate says b fits under
    // the session's broadcast threshold: b is the FULL corpus
    // projected to (id, id, prefix), so an unconditional hint would
    // force an O(N) broadcast relation at production scale. Over the
    // threshold the planner picks a shuffle join on doc_a instead.
    val bFits = b.queryExecution.optimizedPlan.stats.sizeInBytes <=
      spark.sessionState.conf.autoBroadcastJoinThreshold
    a.join(if (bFits) broadcast(b) else b, "doc_a")
      .select(col("doc_a"), col("doc_b"), col("s_a"), col("s_b"))
      .as[(Long, Long, String, String)]
      .map { case (da, db, sa, sb) =>
        val d = levenshteinDist(sa, sb)
        val m = math.max(sa.length, sb.length)
        val sim = if (m == 0) 1.0 else 1.0 - d.toDouble / m
        (da, db, d, sim)
      }
      .toDF("doc_a", "doc_b", "edit_dist", "sim_raw")
      .select(col("doc_a"), col("doc_b"), col("edit_dist"),
        round(col("sim_raw"), 4).as("sim"))
      .orderBy("doc_a")
  }

  def d15Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    tf.join(df, "w")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("n_corpus") / col("df"))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= 3)
      .select(
        col("doc_id"), col("rnk").cast("int").as("rnk"), col("w").as("term"),
        round(col("score"), 4).as("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** d21: duplicate-n-gram profile (the Gopher-style repetition gate
    * at n-gram granularity, complementing d14's word-level TTR): for
    * n in {2, 3, 5}, the fraction of a document's n-gram occurrences
    * that are repeats of an earlier n-gram in the SAME document.
    *
    * Within-doc distinctness needs only that document's words, so this
    * is a pure MAP — one typed pass, a local hash set per (doc, n),
    * ZERO shuffle. At 100 TB it scales embarrassingly: no exchange, no
    * state beyond one document's n-gram set at a time. (The exploded
    * groupBy(doc, gram) alternative shuffles every n-gram occurrence —
    * 5x the corpus bytes — to compute a per-doc-local property.)
    */
  def d21DupNgrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        Seq(2, 3, 5).map { n =>
          val total = math.max(ws.length - n + 1, 0)
          val seen = new scala.collection.mutable.HashSet[String]
          var i = 0
          while (i < total) { seen += ws.slice(i, i + n).mkString(" "); i += 1 }
          val dupFrac =
            if (total == 0) 0.0 else 1.0 - seen.size.toDouble / total
          (id, n, total, seen.size, dupFrac)
        }
      }
      .toDF("doc_id", "n", "total_ngrams", "distinct_ngrams", "dup_raw")
      // round() here (not in the JVM lambda) so Spark and DuckDB apply
      // the same half-up decimal rounding — the proven oracle pattern.
      .select(col("doc_id"), col("n"), col("total_ngrams"),
        col("distinct_ngrams"), round(col("dup_raw"), 4).as("dup_frac"))
      .orderBy("doc_id", "n")
  }

  /** Per-mille keep quotas for d22 — chosen to pull the corpus toward
    * language balance (en dominates the synthetic corpus ~2:1).
    */
  val SampleQuotaPerMille: Map[String, Int] =
    Map("en" -> 250, "de" -> 600, "fr" -> 600, "es" -> 600, "zh" -> 600)

  /** d22: deterministic stratified downsampling — the language-balance
    * resample every multilingual training-data pipeline runs. A doc is
    * kept iff its content-hash per-mille bucket falls under its
    * language's quota: purely content-addressed (d18's stability
    * property — membership never depends on row order, partitioning,
    * or corpus composition), so reruns and incremental appends are
    * bit-stable. One typed map, zero shuffle, trivially distributed.
    */
  def d22StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).as[(Long, String, String)]
      .map { case (id, lang, text) =>
        val mille = (Dedup.polyHash(text.trim.toLowerCase) % 1000L).toInt
        val quota = SampleQuotaPerMille.getOrElse(lang, 500)
        (id, lang, mille, mille < quota)
      }
      .toDF("doc_id", "lang", "mille", "kept")
      .orderBy("doc_id")
  }

  /** Stopwords for d23's minimum-stopword rule (Gopher uses a similar
    * tiny English set as a "looks like natural language" proxy).
    */
  val FilterStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "for")

  /** d23: composite quality-rule FILTER — the decision gate a curation
    * pipeline runs after scoring (d03 computes features; this one
    * decides, Gopher/C4-style): word-count bounds, mean-word-length
    * band, minimum stopword ratio, maximum word length. Emits the kept
    * flag plus deterministic semicolon-joined reason codes so dropped
    * documents are auditable.
    *
    * Every feature is rational arithmetic over exact integer counts
    * (no ln/exp — engine-portable, same reasoning as d15), and the
    * whole pass is one typed map: ZERO shuffle, embarrassingly
    * parallel at any corpus size.
    */
  def d23QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stops = FilterStopwords.toSet
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val n = ws.length
        val sumLen = ws.map(_.length.toLong).sum
        val nStop = ws.count(stops.contains)
        val maxLen = if (n == 0) 0 else ws.map(_.length).max
        val reasons = Seq(
          if (n < 25) Some("too_few_words") else None,
          if (n > 1000) Some("too_many_words") else None,
          if (n > 0 && sumLen * 10 < n * 30) Some("short_words") else None,
          if (n > 0 && sumLen * 10 > n * 80) Some("long_words") else None,
          if (n > 0 && nStop * 100 < n * 5) Some("low_stopword") else None,
          if (maxLen > 20) Some("giant_word") else None
        ).flatten
        (id, n, sumLen, nStop, maxLen,
          reasons.isEmpty, reasons.mkString(";"))
      }
      .toDF("doc_id", "n_words", "sum_word_len", "n_stop", "max_word_len",
        "kept", "reasons")
      .withColumn("mean_word_len",
        round(col("sum_word_len") * 1.0 / greatest(col("n_words"), lit(1)), 4))
      .withColumn("stop_ratio",
        round(col("n_stop") * 1.0 / greatest(col("n_words"), lit(1)), 4))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("stop_ratio"), col("max_word_len"), col("kept"), col("reasons"))
      .orderBy("doc_id")
  }

  /** Words per block for d24's block-granular dedup. */
  val DedupBlockWords = 10

  /** d24: block-granular exact dedup WITH document reconstruction —
    * the C4 move: instead of dropping whole near-dup documents, drop
    * every repeated 10-word block (first occurrence by (doc_id, idx)
    * wins, globally) and stitch the survivors back together. Output is
    * the per-doc block census plus an md5 of the reconstructed text, so
    * the oracle proves the rebuilt corpus byte-for-byte.
    *
    * Shape: one typed block pass (O(words)), first-occurrence election
    * as a window over the block hash (high-cardinality key — shuffle is
    * O(blocks), never pairwise), then a per-doc ordered re-assembly via
    * array_sort(collect_list) — each group holds ONE document's blocks,
    * bounded by doc length, not corpus size.
    */
  def d24BlockDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // The block table feeds BOTH the census and the election; without a
    // checkpoint the typed block pass runs twice (d13/d17's pattern).
    val blocks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        ws.grouped(DedupBlockWords).zipWithIndex.map { case (b, i) =>
          (id, i, b.mkString(" "))
        }
      }
      .toDF("doc_id", "idx", "s")
      .withColumn("h", md5(col("s")))
      .localCheckpoint(true)
    val elected = blocks
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))))
    val kept = elected.filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("s")))),
            x => x.getField("s")), " ")).as("recon_md5"))
    val census = blocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_blocks"))
    census.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("recon_md5"), md5(lit(""))).as("recon_md5"))
      .orderBy("doc_id")
  }

  /** d26: character/word diversity scoring via GINI IMPURITY
    * (1 - sum p_i^2) — the entropy-style "is this natural text or
    * degenerate junk" signal, but in PURE RATIONAL arithmetic: entropy
    * needs ln(), whose last-ulp behavior differs across libm builds
    * (the d15 lesson), while Gini is +,-,*,/ only and replays exactly.
    * Low char-Gini = a few characters dominate (aaaa...); low
    * word-Gini = low lexical diversity. One typed map, zero shuffle.
    *
    * Computed as 1 - sum(c_i^2) / n^2 with INTEGER numerators, divided
    * once at the end — one IEEE division per score, bit-identical in
    * any engine.
    */
  def d26CharDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // Count CODEPOINTS, not UTF-16 code units: the DuckDB oracle's
        // length()/slicing is codepoint-based, and a surrogate-pair
        // character (emoji) counted as two units would skew both
        // n_chars and the Gini numerator against the replay.
        val cps = text.codePoints().toArray.filter(_ != ' '.toInt)
        val charSq = cps.groupBy(identity).values
          .map(g => g.length.toLong * g.length).sum
        val ws = text.split(" ").filter(_.nonEmpty)
        val wordSq = ws.groupBy(identity).values
          .map(g => g.length.toLong * g.length).sum
        (id, cps.length.toLong, charSq, ws.length.toLong, wordSq)
      }
      .toDF("doc_id", "n_chars", "char_sq", "n_words", "word_sq")
      // Fixed-point parts-per-million via INTEGER half-up division —
      // round(double, 6) sits on different ulp boundaries in different
      // engines (observed: 0.936762 vs 0.936763), while
      // (num*2M + den) div (2*den) is bit-exact everywhere. Overflows
      // only past ~1e6-char documents (den*2M > 2^63); a quality gate
      // truncates documents long before that.
      .select(
        col("doc_id"), col("n_chars"), col("n_words"),
        expr("""CASE WHEN n_chars > 0 THEN
            ((n_chars * n_chars - char_sq) * 2000000 + n_chars * n_chars)
              div (2 * n_chars * n_chars)
          ELSE CAST(0 AS BIGINT) END""").as("char_gini_ppm"),
        expr("""CASE WHEN n_words > 0 THEN
            ((n_words * n_words - word_sq) * 2000000 + n_words * n_words)
              div (2 * n_words * n_words)
          ELSE CAST(0 AS BIGINT) END""").as("word_gini_ppm"))
      .orderBy("doc_id")
  }

  /** Context-window capacity (tokens) for d25's packing. */
  val PackCapacity = 128L

  /** d25: GPT-style concat-and-chunk sequence packing — documents are
    * concatenated in doc_id order and the token stream is cut into
    * fixed 128-token context windows; each document reports the chunk
    * span it lands in and how many window boundaries cross it. The
    * standard pretraining batch-prep step (pack, don't pad).
    *
    * The global token offset is [[Ranks.withRunningTotal]] — a
    * distributed two-pass prefix sum (range partition + per-partition
    * totals + broadcast offsets), NOT an unpartitioned running-sum
    * window: no task ever scans more than 1/numPartitions of the
    * corpus, and the only driver-side state is O(numPartitions) longs.
    */
  def d25PackChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, text.split(" ").count(_.nonEmpty).toLong) }
      .toDF("doc_id", "n_tokens")
    // `div` (integer division) not floor(/): the double round-trip is
    // only exact below 2^53, and a 100 TB corpus's token offsets are
    // headed there.
    Ranks.withRunningTotal(counts, Seq(col("doc_id")), "n_tokens", "tok_start")
      .withColumn("start_chunk", expr(s"tok_start div $PackCapacity"))
      .withColumn("end_chunk",
        when(col("n_tokens") > 0,
          expr(s"(tok_start + n_tokens - 1) div $PackCapacity"))
          .otherwise(col("start_chunk")))
      .withColumn("n_chunks",
        when(col("n_tokens") > 0, col("end_chunk") - col("start_chunk") + 1)
          .otherwise(lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        col("start_chunk"), col("end_chunk"), col("n_chunks"))
      .orderBy("doc_id")
  }

  /** d27: RAG-style OVERLAPPING chunking profile — documents cut into
    * 128-token windows with a 96-token stride (32-token overlap), the
    * retrieval-prep complement of d25's non-overlapping packing. Per
    * document: chunk count and the summed chunk lengths (their excess
    * over n_ws IS the duplicated-token overlap cost a retrieval index
    * pays). One narrow explode of ~n/stride start offsets per doc,
    * then a partial-agg groupBy on doc_id — no cross-doc shuffle of
    * text, and the token convention is d02's whitespace split
    * (trailing empties kept, = DuckDB string_split).
    */
  val ChunkCap = 128
  val ChunkStride = 96

  def d27ChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text")).as("n_ws"))
      .select(col("doc_id"), col("n_ws"),
        explode(sequence(lit(0), col("n_ws") - 1, lit(ChunkStride))).as("s0"))
      .groupBy(col("doc_id"), col("n_ws"))
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(least(lit(ChunkCap), col("n_ws") - col("s0"))).as("sum_len"))
      .select(col("doc_id"), col("n_ws"), col("n_chunks"), col("sum_len"),
        (col("sum_len") - col("n_ws")).as("overlap_tokens"))
      .orderBy(col("doc_id"))

  /** d32: CONTAINMENT decontamination — find training documents that
    * CONTAIN a held-out/benchmark document (doc_id % 10 = 7 plays the
    * eval set): containment(test ⊆ train) = |sh(test) ∩ sh(train)| /
    * |sh(test)| ≥ 0.5 over distinct 3-word shingles. This is the
    * asymmetric overlap Jaccard machinery MISSES by construction — a
    * small test doc embedded in a large train doc has low Jaccard, so
    * d06's LSH bands rarely collide and d17's fingerprint count has
    * no denominator — yet it is exactly the leakage shape benchmark
    * contamination takes.
    *
    * Blocking is a RARE-SHINGLE INVERTED INDEX, the right blocker for
    * containment: explode shingles, drop shingles with document
    * frequency > 10 (boilerplate shingles generate quadratic postings
    * and no evidence), join test postings to train postings on the
    * shingle, and keep pairs sharing ≥ 3 rare shingles. Candidate
    * work is Σ df² over RARE shingles only — df-capped, so linear in
    * corpus size — and the exact intersect verify runs only on
    * candidates. Never an all-pairs compare.
    */
  def d32Containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .map { case (id, t) => (id, Dedup.shinglesOf(t)) }
      .toDF("doc_id", "shingles")
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("g"))
    val rare = ex.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= 10)
      .select(col("g"))
    val er = ex.join(rare, "g")
    val isTest = pmod(col("doc_id"), lit(10)) === 7
    val cand = er.filter(isTest).select(col("g"), col("doc_id").as("test_id"))
      .join(er.filter(!isTest).select(col("g"), col("doc_id").as("train_id")), "g")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
    cand
      .join(sh.select(col("doc_id").as("test_id"), col("shingles").as("sh_t")), "test_id")
      .join(sh.select(col("doc_id").as("train_id"), col("shingles").as("sh_r")), "train_id")
      .withColumn("containment",
        size(array_intersect(col("sh_t"), col("sh_r"))).cast("double") /
          size(col("sh_t")))
      .filter(col("containment") >= 0.5)
      .select(col("train_id").as("train_doc_id"), col("test_id").as("test_doc_id"),
        round(col("containment"), 4).as("containment"))
      .orderBy(col("train_doc_id"), col("test_doc_id"))
  }

  val d32OracleSql: String =
    s"""WITH t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
       |sh AS (SELECT doc_id, ${Dedup.shingleSql} AS shingles FROM t),
       |ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
       |rare AS (SELECT g FROM (SELECT g, count(*) AS df FROM ex GROUP BY g)
       |         WHERE df <= 10),
       |er AS (SELECT doc_id, g FROM ex JOIN rare USING (g)),
       |cand AS (
       |  SELECT a.doc_id AS test_id, b.doc_id AS train_id, count(*) AS shared
       |  FROM er a JOIN er b USING (g)
       |  WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7
       |  GROUP BY 1, 2 HAVING count(*) >= 3),
       |ver AS (
       |  SELECT train_id, test_id,
       |    len(list_intersect(ta.shingles, tb.shingles)) * 1.0
       |      / len(ta.shingles) AS containment
       |  FROM cand
       |  JOIN sh ta ON ta.doc_id = test_id
       |  JOIN sh tb ON tb.doc_id = train_id)
       |SELECT train_id AS train_doc_id, test_id AS test_doc_id,
       |  round(containment, 4) AS containment
       |FROM ver WHERE containment >= 0.5
       |ORDER BY train_doc_id, test_doc_id""".stripMargin

  val d27OracleSql: String =
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n
      |  FROM documents),
      |s AS (SELECT doc_id, n, unnest(range(0, n, 96)) AS s0 FROM d)
      |SELECT doc_id, CAST(n AS INT) AS n_ws,
      |  CAST(count(*) AS INT) AS n_chunks,
      |  CAST(sum(least(128, n - s0)) AS BIGINT) AS sum_len,
      |  CAST(sum(least(128, n - s0)) - n AS BIGINT) AS overlap_tokens
      |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin

  /** d44: TEMPERATURE-SCALED MIXTURE SAMPLING — the T-scaled recipe
    * real multilingual/multi-source data mixes use (sample source i
    * with probability ∝ p_i^(1/T), T > 1 flattening toward rare
    * sources), generalizing d34's fixed target weights. EXACT
    * integer arithmetic via repeated integer square roots: the
    * temperature weight of a source with n docs is n (T=1),
    * isqrt(n) (T=2), or isqrt(isqrt(n)) (T=4) — n^(1/T) for the
    * power-of-two temperatures, with isqrt = floor(sqrt(n)) which
    * IEEE computes exactly for integral n (sqrt is correctly
    * rounded; the nearest non-square is Θ(√n) away, astronomically
    * beyond one ulp), so Spark and DuckDB agree bit-for-bit. The
    * keep-rate/budget/hash-gate machinery is d34's verbatim: rate
    * bp_i = min(10000, w_i·(N/2)·10000 / (W·n_i)), survive iff
    * polyHash(text) % 10000 < bp. Same scale shape as d34: one map,
    * one O(sources) agg, one broadcast join — the corpus never
    * shuffles.
    */
  def temperatureSample(docs: DataFrame, temperature: Int): DataFrame = {
    require(Set(1, 2, 4).contains(temperature),
      s"temperature $temperature: the exact-integer weights support " +
        "T in {1, 2, 4} (repeated integer square roots)")
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        (id, src, Dedup.polyHash(text.trim.toLowerCase) % 10000L)
      }
      .toDF("doc_id", "source", "h")
    def isqrt(c: org.apache.spark.sql.Column) =
      floor(sqrt(c.cast("double"))).cast("long")
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", temperature match {
        case 1 => col("n_docs")
        case 2 => isqrt(col("n_docs"))
        case 4 => isqrt(isqrt(col("n_docs")))
      })
    val tot = counts
      .agg(sum(col("n_docs")).as("n_total"), sum(col("w")).as("w_total"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("bp", least(lit(10000L),
        expr("(w * (n_total div 2) * 10000) div (w_total * n_docs)")))
      .select(col("source"), col("n_docs"), col("w"), col("bp"))
      .localCheckpoint(true)
    val kept = hashed
      .join(broadcast(rates.select(col("source"), col("bp"))), "source")
      .filter(col("h") < col("bp"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("w"), col("bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  def d44TemperatureSample(spark: SparkSession, dir: String): DataFrame =
    temperatureSample(Tables.documents(spark, dir), temperature = 2)

  val d44OracleSql: String =
    """WITH t AS (SELECT doc_id, source, lower(trim(text)) AS s FROM documents),
      |h AS (SELECT doc_id, source,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    [CAST(unicode(s[i:i]) AS BIGINT) FOR i IN range(1, length(s) + 1)]),
      |  (a, c) -> (a * 131 + c) % 1000000007) % 10000 AS hh FROM t),
      |c AS (SELECT source, count(*) AS n_docs,
      |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
      |  FROM t GROUP BY 1),
      |tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
      |    CAST(sum(w) AS BIGINT) AS w_total FROM c),
      |r AS (SELECT source, n_docs, w,
      |    least(10000, (w * (n_total // 2) * 10000) // (w_total * n_docs))
      |      AS bp
      |  FROM c CROSS JOIN tt),
      |k AS (SELECT h.source, count(*) AS n_kept
      |  FROM h JOIN r ON h.source = r.source WHERE hh < bp GROUP BY 1)
      |SELECT r.source, r.n_docs, r.w, r.bp, COALESCE(k.n_kept, 0) AS n_kept
      |FROM r LEFT JOIN k ON r.source = k.source ORDER BY r.source""".stripMargin

  /** d34: TRAINING-MIXTURE RESAMPLING — re-weight a multi-source
    * corpus to TARGET mixture proportions by deterministic
    * hash-thresholded downsampling (the "sample The Pile to your
    * data-mix recipe" pass): target weight of source `src<i>` is
    * (i+1) (a derived recipe so the oracle replays it); the total
    * budget is half the corpus; each source's keep-rate in basis
    * points is min(10000, targetShare·budget / n_source) in EXACT
    * integer arithmetic, and a document survives iff
    * polyHash(text) % 10000 < bp — the same content-stable hash d18's
    * split uses, so membership is reproducible across runs, engines,
    * and corpus growth (a doc's fate never depends on other docs).
    *
    * Scale: one map for the hash, one O(sources) stats agg, one
    * broadcast join + filter — no shuffle of the corpus beyond the
    * partial-agg counts; the census-forbidden per-source window never
    * appears.
    */
  def d34MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        (id, src, Dedup.polyHash(text.trim.toLowerCase) % 10000L)
      }
      .toDF("doc_id", "source", "h")
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        regexp_extract(col("source"), "(\\d+)", 1).cast("long") + 1)
    val tot = counts
      .agg(sum(col("n_docs")).as("n_total"), sum(col("w")).as("w_total"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("bp", least(lit(10000L),
        expr("(w * (n_total div 2) * 10000) div (w_total * n_docs)")))
      .select(col("source"), col("n_docs"), col("bp"))
      .localCheckpoint(true)
    val kept = docs.join(broadcast(rates.select(col("source"), col("bp"))), "source")
      .filter(col("h") < col("bp"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** 5-gram window for d35's exact-match decontamination. */
  val DecontamN = 5

  /** d35: EXACT N-GRAM DECONTAMINATION — the GPT-3/PaLM method: a
    * training document is contaminated when it shares ANY exact
    * [[DecontamN]]-gram (whitespace tokens, d16's convention) with
    * the held-out set (doc_id ≡ 0 mod 10 plays the benchmark). This
    * is the third leg of the decontamination triad: d17 catches
    * paraphrase-adjacent copies via winnowed fingerprints, d32
    * catches asymmetric containment via rare-shingle blocking, d35
    * is the literal exact-substring rule labs actually publish.
    *
    * Shape: one explode to DISTINCT (doc, gram) pairs per side, one
    * equi-join on the gram, one partial-agg count — linear in corpus
    * token count, never pairwise. (Exactness is the method's
    * definition, so no df-cap: a boilerplate gram that floods
    * postings legitimately contaminates every doc carrying it.)
    * Output: contaminated train docs with distinct shared-gram counts.
    */
  def d35NgramDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // Pure Column expressions (no typed flatMap): the gram explosion
    // stays inside whole-stage codegen — no Row encode/decode per
    // document on the corpus-sized pass.
    def grams(df: DataFrame): DataFrame = Par.fanOut(df
      .select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        array_remove(split(col("text"), " "), "").as("ws"))
      .filter(size(col("ws")) >= DecontamN)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) - ${DecontamN - 1}), " +
          s"i -> concat_ws(' ', slice(ws, i, $DecontamN)))")).as("g"))
      .distinct()
    val held = grams(docs.filter(pmod(col("doc_id"), lit(10)) === 0))
      .select(col("g")).distinct()
    grams(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))
      .join(held, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // pairs are pre-distinct
      .orderBy(col("doc_id"))
  }

  val d35OracleSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |    unnest([array_to_string(ws[i:i+4], ' ')
      |            FOR i IN range(1, len(ws) - 3)]) AS g
      |  FROM t),
      |held AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, g FROM g WHERE doc_id % 10 <> 0)
      |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |FROM tr JOIN held USING (g)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** d36: N-GRAM LM PERPLEXITY FILTER — the classic quality gate
    * (CCNet/GPT-3 recipe): train a word-bigram language model on the
    * held-out-clean slice (doc_id % 10 == 0, the same slice d35
    * treats as trusted), score every other document by its average
    * negative log-likelihood under that model, and flag the worst
    * decile.
    *
    * NO-ln DISCIPLINE (the d26 lesson): -log2 p is taken at whole-BIT
    * granularity from pure integer arithmetic — for add-1-smoothed
    * p = (c(w1,w2)+1) / (c(w1)+V), per-bigram surprisal is
    * bitlen(c(w1)+V) - bitlen(c(w1,w2)+1), where bitlen(x) =
    * length(bin(x)) is exact and identical in Spark and DuckDB —
    * no libm, no ulp drift, replays bit-for-bit. Doc score =
    * total_bits * 1000 div n_bigrams (integer millibits/token).
    *
    * Scale shape: LM training is two partial-agg groupBys over the
    * clean slice's bigrams; scoring is two equi-joins (AQE broadcasts
    * the LM tables when they fit); the worst-decile threshold comes
    * from the SCORE HISTOGRAM — O(distinct millibit scores ≤ ~64k)
    * rows to the driver, never a global sort — and boundary ties
    * break by doc_id under a window PARTITIONED BY SCORE (parallel
    * across scores, no single-partition stage).
    */
  def d36LmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fanOut: the split/explode/bigram stages below are the hot path
    // and the bench scan is one partition (no-op at production scale).
    val docs = Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_remove(split(col("text"), " "), "").as("ws")))
    val bi = docs.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), " +
          "i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val clean = bi.filter(pmod(col("doc_id"), lit(10)) === 0)
    val bigCnt = clean.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_big"))
    // ONE pass over the clean slice's words serves BOTH LM inputs:
    // grouping every occurrence by word gives vocab = the group count,
    // and summing the non-final-position flag gives c_ctx(w) = the
    // bigram-first count (a final-only word gets c_ctx = 0, which the
    // scorer's coalesce(c_ctx, 0) treated identically as a join miss).
    val wordCnt = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(size(col("ws")).as("n"),
        posexplode(col("ws")).as(Seq("i", "w1")))
      .groupBy(col("w1"))
      .agg(sum(when(col("i") < col("n") - 1, 1L).otherwise(0L)).as("c_ctx"))
      .localCheckpoint(true) // reused: vocab count + the scoring join
    val vocab = wordCnt.count()
    val ctxCnt = wordCnt
    val scored = bi.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .join(bigCnt, Seq("w1", "w2"), "left")
      .join(ctxCnt, Seq("w1"), "left")
      .select(col("doc_id"),
        (length(bin(coalesce(col("c_ctx"), lit(0L)) + lit(vocab))) -
          length(bin(coalesce(col("c_big"), lit(0L)) + lit(1L))))
          .cast("long").as("bits"))
    val perDoc = scored.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"), sum(col("bits")).as("total_bits"))
      .withColumn("nll_millibits", expr("(total_bits * 1000) div n_bigrams"))
      .localCheckpoint(true) // reused: histogram pass + final flag pass
    // Exact worst-decile boundary off the tiny score histogram: walk
    // scores high->low until the k = n/10 quota lands inside one
    // bucket; that bucket's overflow is taken by lowest doc_id.
    val hist = perDoc.groupBy(col("nll_millibits"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    val k = hist.map(_._2).sum / 10
    var cum = 0L
    var sStar = Long.MaxValue // k == 0: nothing flagged
    var quotaAt = 0L
    for ((sv, c) <- hist if cum < k) { sStar = sv; quotaAt = k - cum; cum += c }
    val wScore = Window.partitionBy(col("nll_millibits")).orderBy(col("doc_id"))
    perDoc
      .withColumn("rn_in_score", row_number().over(wScore))
      .withColumn("worst_decile",
        (col("nll_millibits") > sStar) ||
          (col("nll_millibits") === sStar && col("rn_in_score") <= quotaAt))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        col("nll_millibits"), col("worst_decile"))
      .orderBy(col("doc_id"))
  }

  val d36OracleSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |b AS (SELECT doc_id,
      |    unnest([{'w1': ws[i], 'w2': ws[i+1]} FOR i IN range(1, len(ws))]) AS bg
      |  FROM t WHERE len(ws) >= 2),
      |bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
      |big AS (SELECT w1, w2, count(*) AS c FROM bb WHERE doc_id % 10 = 0
      |  GROUP BY 1, 2),
      |ctx AS (SELECT w1, count(*) AS c FROM bb WHERE doc_id % 10 = 0
      |  GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS nv
      |  FROM (SELECT unnest(ws) AS w FROM t WHERE doc_id % 10 = 0)),
      |sc AS (SELECT bb.doc_id,
      |    length(bin(COALESCE(ctx.c, 0) + v.nv))
      |      - length(bin(COALESCE(big.c, 0) + 1)) AS bits
      |  FROM bb CROSS JOIN v
      |  LEFT JOIN big ON bb.w1 = big.w1 AND bb.w2 = big.w2
      |  LEFT JOIN ctx ON bb.w1 = ctx.w1
      |  WHERE bb.doc_id % 10 <> 0),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(bits) AS BIGINT) AS total_bits,
      |    CAST((sum(bits) * 1000) // count(*) AS BIGINT) AS nll_millibits
      |  FROM sc GROUP BY 1),
      |r AS (SELECT *,
      |    row_number() OVER (ORDER BY nll_millibits DESC, doc_id) AS rn,
      |    count(*) OVER () AS n FROM agg)
      |SELECT doc_id, n_bigrams, total_bits, nll_millibits,
      |  rn <= n // 10 AS worst_decile
      |FROM r ORDER BY doc_id""".stripMargin

  val d34OracleSql: String =
    """WITH t AS (SELECT doc_id, source, lower(trim(text)) AS s FROM documents),
      |h AS (SELECT doc_id, source,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    [CAST(unicode(s[i:i]) AS BIGINT) FOR i IN range(1, length(s) + 1)]),
      |  (a, c) -> (a * 131 + c) % 1000000007) % 10000 AS hh FROM t),
      |c AS (SELECT source, count(*) AS n_docs,
      |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) + 1 AS w
      |  FROM t GROUP BY 1),
      |tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
      |    CAST(sum(w) AS BIGINT) AS w_total FROM c),
      |r AS (SELECT source, n_docs,
      |    least(10000, (w * (n_total // 2) * 10000) // (w_total * n_docs))
      |      AS bp
      |  FROM c CROSS JOIN tt),
      |k AS (SELECT h.source, count(*) AS n_kept
      |  FROM h JOIN r ON h.source = r.source WHERE hh < bp GROUP BY 1)
      |SELECT r.source, r.n_docs, r.bp, COALESCE(k.n_kept, 0) AS n_kept
      |FROM r LEFT JOIN k ON r.source = k.source ORDER BY r.source""".stripMargin

  /** d37: corpus-level duplicate-sentence REMOVAL — C4's cleanup
    * rule re-expressed at sentence granularity: a sentence that
    * occurs more than once ACROSS THE CORPUS is kept only at its
    * first occurrence (min (doc_id, pos), encoded as one sortable
    * integer key — deterministic under any partitioning) and removed
    * everywhere else; each document is then REASSEMBLED from its
    * surviving sentences in original order. Where d13 only SCORES
    * shared sentences, this emits the transformation itself — the
    * per-doc result carries the kept/total counts and an md5 of the
    * cleaned text so the oracle pins the exact reassembly.
    *
    * Scale shape: one explode (map-side), one groupBy h (shuffle
    * O(distinct sentences), partial-agg combined), one join-back on
    * h, one groupBy doc_id reassembly — no windows over SF-growing
    * partitions, no driver-side text. The sentence frame is
    * localCheckpointed once (feeds the frequency agg AND the
    * join-back, same pattern as d13).
    *
    * Sentence split is the d13 convention (". " separator, trimmed,
    * case-normalized hash); position keys assume < 100000 sentences
    * per document (the split arity, not a data-size bound).
    */
  def d37SentenceDedup(spark: SparkSession, dir: String): DataFrame = {
    // Every doc gains the same boilerplate footer before dedup — the
    // shape real corpora carry naturally (site chrome, license
    // notices); the synthetic table has none, and without corpus-wide
    // duplicates the rule would be exercised nowhere. Deterministic,
    // replayed verbatim in the oracle: exactly one document keeps the
    // footer, every other drops it.
    val sents = Tables.documents(spark, dir)
      .withColumn("text",
        concat(col("text"), lit(". all rights reserved boilerplate notice")))
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\. ")).as(Seq("pos0", "s")))
      .withColumn("pos", col("pos0") + 1).drop("pos0")
      .filter(length(trim(col("s"))) > 0)
      .withColumn("h", md5(lower(trim(col("s")))))
      .withColumn("kv", col("doc_id") * 100000L + col("pos"))
      .localCheckpoint(true)
    val first = sents.groupBy(col("h")).agg(min(col("kv")).as("k_min"))
    sents.join(first, "h")
      .withColumn("keep", col("kv") === col("k_min"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_sents"),
        sum(when(col("keep"), 1).otherwise(0)).cast("int").as("n_kept"),
        md5(concat_ws(". ",
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("s"))))),
            e => e.getField("s")))).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  val d37OracleSql: String =
    """WITH t AS (SELECT doc_id,
      |    string_split(text || '. all rights reserved boilerplate notice',
      |      '. ') AS l FROM documents),
      |s0 AS (SELECT doc_id,
      |    unnest([{'pos': i, 's': l[i]} FOR i IN range(1, len(l) + 1)],
      |      recursive := true) FROM t),
      |s AS (SELECT doc_id, pos, s, md5(lower(trim(s))) AS h,
      |    doc_id * 100000 + pos AS kv
      |  FROM s0 WHERE length(trim(s)) > 0),
      |f AS (SELECT h, min(kv) AS k_min FROM s GROUP BY h)
      |SELECT doc_id,
      |  CAST(count(*) AS INT) AS n_sents,
      |  CAST(sum(CASE WHEN kv = k_min THEN 1 ELSE 0 END) AS INT) AS n_kept,
      |  md5(coalesce(
      |    string_agg(CASE WHEN kv = k_min THEN s END, '. ' ORDER BY pos),
      |    '')) AS cleaned_md5
      |FROM s JOIN f USING (h)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** d38: EXACT DUPLICATE-SPAN REMOVAL — the Lee et al. (2022)
    * "Deduplicating Training Data Makes Language Models Better"
    * substring-dedup class, which sentence/doc dedup cannot express:
    * any L-token window (L=8) whose exact text occurs elsewhere in
    * the corpus is removed EXCEPT at its first occurrence (min
    * (doc_id, pos) key, like d37), where "removed" means every token
    * COVERED by a duplicate window goes — overlapping windows merge
    * naturally through position coverage, no interval-merge windows
    * needed. Documents are reassembled from their surviving tokens in
    * order. A shared boilerplate tail (> L tokens) is injected
    * pre-dedup — the license/site-chrome shape real corpora carry;
    * the synthetic table has no natural cross-doc L-grams, and an
    * unexercised rule proves nothing — replayed verbatim in the
    * oracle, so exactly one document keeps the tail and the
    * overlapping-window merge is exercised on every other.
    *
    * Scale shape: gram construction is codegen'd array expressions
    * (transform/sequence/slice — the d35 discipline), the frequency
    * pass is one O(distinct grams) groupBy (partial-agg combined),
    * coverage is one explode of the DUPLICATE occurrences only
    * (O(duplicated positions), not O(tokens)), and reassembly is one
    * per-doc groupBy. No windows over SF-growing data, no driver
    * text.
    */
  def d38SubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val L = 8
    val boiler = " shared footer alpha beta gamma delta epsilon zeta " +
      "eta theta iota kappa"
    // fanOut before the checkpoint: the gram explode + md5 below is
    // the hot path and the bench scan is one partition (no-op at
    // production scale where the scan already splits).
    val toks = Par.fanOut(Tables.documents(spark, dir)
      .withColumn("ws", split(concat(col("text"), lit(boiler)), " "))
      .select(col("doc_id"), col("ws")))
      .localCheckpoint(true) // feeds grams AND reassembly
    val grams = toks
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("ws")) - (L - 1), lit(0))),
        i => struct(i.as("pos"),
          concat_ws(" ", slice(col("ws"), i, lit(L))).as("g")))).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"),
        md5(col("e.g")).as("h"),
        (col("doc_id") * 100000L + col("e.pos")).as("kv"))
      .localCheckpoint(true)
    val first = grams.groupBy(col("h")).agg(min(col("kv")).as("k_min"))
    // positions covered by any NON-FIRST duplicate window
    val covered = grams.join(first, "h")
      .filter(col("kv") =!= col("k_min"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (L - 1))).as("p"))
      .distinct()
    toks
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p0", "w")))
      .withColumn("p", col("p0") + 1).drop("p0")
      .join(covered, Seq("doc_id", "p"), "left_outer")
      .withColumn("keep", covered.col("p").isNull)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        sum(when(col("keep"), 0).otherwise(1)).cast("int").as("n_removed"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("p"), col("w"))))),
            e => e.getField("w")))).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  val d38OracleSql: String =
    """WITH t AS (SELECT doc_id,
      |    string_split(text || ' shared footer alpha beta gamma delta ' ||
      |      'epsilon zeta eta theta iota kappa', ' ') AS ws
      |  FROM documents),
      |g AS (SELECT doc_id, pos,
      |    md5(array_to_string(ws[pos:pos+7], ' ')) AS h,
      |    doc_id * 100000 + pos AS kv
      |  FROM (SELECT doc_id, ws,
      |      unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS pos FROM t)),
      |f AS (SELECT h, min(kv) AS k_min FROM g GROUP BY h),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS p
      |  FROM g JOIN f USING (h) WHERE kv <> k_min),
      |tok AS (SELECT doc_id, p, ws[p] AS w
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS p FROM t))
      |SELECT tok.doc_id,
      |  CAST(count(*) AS INT) AS n_tokens,
      |  CAST(sum(CASE WHEN cov.p IS NULL THEN 0 ELSE 1 END) AS INT)
      |    AS n_removed,
      |  md5(coalesce(string_agg(CASE WHEN cov.p IS NULL THEN w END, ' '
      |    ORDER BY tok.p), '')) AS cleaned_md5
      |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
      |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin

  // -------------------------------------------------- sequence packing

  /** Context-window size for [[d46SequencePack]] (tokens per packed
    * training sequence; 4096 is a common pretraining setting).
    */
  val PackWindow = 4096L

  /** d46: SEQUENCE PACKING — the concat-then-chunk recipe pretraining
    * pipelines use to fill fixed-length context windows: documents
    * concatenate in stream order (doc_id) and the token stream chunks
    * into windows of [[PackWindow]]. Each doc's window assignment is
    * pure arithmetic on the EXCLUSIVE prefix sum of its token count —
    * computed with the distributed scan primitive
    * ([[Ranks.withRunningTotal]]: range-partition + per-partition
    * totals + broadcast offsets; no single-task window). Output per
    * window: docs starting in it, their token mass, and how many
    * straddle the boundary into the next window (the fragmentation a
    * packer trades against padding). Token count = the d02 whitespace
    * tokenization, so both engines agree exactly.
    */
  def d46SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      // coalesce against a literal pins nullable=false (the scan
      // primitive requires it; text is non-null in the data anyway)
      .select(col("doc_id"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
          .as("tokens"))
    val cum = Ranks.withRunningTotal(
      toks, Seq(col("doc_id")), "tokens", "cum")
    cum
      // `div` is Spark's INTEGRAL division (`/` on longs widens to
      // double) — cum/tokens are nonnegative, so div == floor ==
      // DuckDB's `//`
      .select(col("doc_id"), col("tokens"),
        expr(s"cum div $PackWindow").as("bin"),
        expr(s"(cum + tokens - 1) div $PackWindow").as("end_bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tokens_sum"),
        sum(when(col("end_bin") > col("bin"), 1L).otherwise(0L))
          .as("n_straddle"))
      .orderBy(col("bin"))
  }

  // ------------------------------------------- deterministic shuffle

  /** Seed mixed into the d47 shuffle key; changing it permutes the
    * whole training order deterministically.
    */
  val ShuffleSeed = 17L

  /** Shard count for the d47 reshard. */
  val ShuffleShards = 8

  /** d47: DETERMINISTIC GLOBAL SHUFFLE — the training-order reshard a
    * pretraining pipeline runs last: corpus order randomizes as a
    * PURE FUNCTION of content + seed (shuffle key = the d18 Horner
    * content hash mixed with [[ShuffleSeed]]), rows take their global
    * position from ONE range-partitioned sort on that key
    * ([[Ranks.withGlobalIndex]] — per-partition counts + broadcast
    * offsets, no single-task window, no driver state), and positions
    * bin into [[ShuffleShards]] near-equal shards with standard
    * NTILE arithmetic (first `total mod n` shards one row larger).
    * Re-running on the same corpus + seed reproduces the order
    * bit-for-bit regardless of input partitioning — the
    * reproducibility contract training runs need.
    */
  def d47GlobalShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val ph = Dedup.polyHash(text.trim.toLowerCase)
        (id, (ph * 1000003L + ShuffleSeed) % 1000000007L)
      }.toDF("doc_id", "skey")
    val total = keyed.count()
    val nsh = ShuffleShards.toLong
    require(total >= nsh, s"corpus of $total docs < $nsh shards")
    val q = total / nsh
    val r = total % nsh
    Ranks.withGlobalIndex(keyed, Seq(col("skey"), col("doc_id")), "idx0")
      .withColumn("pos", col("idx0") + lit(1L))
      // NTILE(n) arithmetic on nonnegative longs: `div` == floor ==
      // DuckDB `//`
      .withColumn("shard",
        when(col("pos") <= lit(r * (q + 1)),
          expr(s"((pos - 1) div ${q + 1}) + 1"))
          .otherwise(expr(s"$r + ((pos - 1 - ${r * (q + 1)}) div $q) + 1"))
          .cast("int"))
      .select(col("doc_id"), col("skey"), col("pos"), col("shard"))
      .orderBy(col("pos"))
  }

  /** d47 oracle: same content hash, same seed mix, same NTILE
    * arithmetic — the order is a pure function both engines replay.
    */
  def d47OracleSql: String =
    s"""WITH t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
       |h AS (SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    [CAST(unicode(s[i:i]) AS BIGINT) FOR i IN range(1, length(s) + 1)]),
       |  (a, c) -> (a * 131 + c) % 1000000007) AS ph FROM t),
       |k AS (SELECT doc_id,
       |  (ph * 1000003 + $ShuffleSeed) % 1000000007 AS skey FROM h),
       |p AS (SELECT doc_id, skey,
       |  CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS pos,
       |  (SELECT count(*) FROM k) AS total FROM k)
       |SELECT doc_id, skey, pos,
       |  CAST(CASE WHEN pos <= (total % $ShuffleShards) * (total // $ShuffleShards + 1)
       |    THEN (pos - 1) // (total // $ShuffleShards + 1) + 1
       |    ELSE (total % $ShuffleShards)
       |      + (pos - 1 - (total % $ShuffleShards) * (total // $ShuffleShards + 1))
       |        // (total // $ShuffleShards) + 1
       |  END AS INT) AS shard
       |FROM p ORDER BY pos""".stripMargin

  /** d46 oracle: the same exclusive running sum as a window frame —
    * integer division only, token counts via the d02-pinned
    * whitespace split.
    */
  def d46OracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tokens,
       |    coalesce(sum(tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM t)
       |SELECT CAST(cum // $PackWindow AS BIGINT) AS bin,
       |  count(*) AS n_docs,
       |  CAST(sum(tokens) AS BIGINT) AS tokens_sum,
       |  CAST(sum(CASE WHEN (cum + tokens - 1) // $PackWindow
       |    > cum // $PackWindow THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
}
