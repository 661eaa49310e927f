package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE merge-pair TRAINING over the documents corpus (SURVEY.md §2
  * text-analysis mandate; d02 applies a BPE-ish tokenizer, this
  * LEARNS the merge table) — the classic Sennrich et al. 2016
  * subword algorithm, distributed the way production tokenizer
  * trainers run it:
  *
  *   1. Corpus → word-frequency VOCABULARY (one explode + groupBy —
  *      the only corpus-sized pass; everything after runs on the
  *      vocab, which is ≪ corpus and essentially saturates: 100 TB
  *      of text has the same few-million-type tail as 1 TB).
  *   2. Each word → space-delimited symbol string ("h e l l o").
  *   3. Per round: count adjacent symbol pairs weighted by word
  *      frequency (groupBy (a,b) with map-side combine), elect the
  *      most frequent pair (deterministic tie-break: count DESC,
  *      then (a,b) lexicographic), then merge every occurrence
  *      left-to-right via literal string `replace` ("h e" → "he").
  *
  * The per-round argmax is a 1-ROW collect (the elected pair), the
  * same bounded driver-side narrowing Percentiles uses — O(rounds)
  * single-row collects, never vocab-sized. The merge-apply is a
  * map-only projection; each round's vocab is cached and the prior
  * round unpersisted, so lineage stays O(1) deep.
  *
  * PARITY: greedy left-to-right non-overlapping merge application is
  * exactly literal-`replace` semantics, and Spark's `replace` and
  * DuckDB's `replace` agree on it (e.g. merging (a,a) in "a a a"
  * gives "aa a" in both). The oracle replays the identical rounds as
  * an UNROLLED materialized-CTE chain — same normalization, same
  * char split, same tie-break, same `replace`.
  */
object Bpe {

  val MergeRounds = 8

  /** (w: space-delimited symbol string, n: word frequency) — the
    * trainer's working state at round 0. Words are lowercased
    * [a-z0-9]+ runs, so the ' ' delimiter can never collide with a
    * symbol.
    */
  private def vocab0(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(
        regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " ").as("w"),
        col("n"))

  /** Adjacent symbol pairs of one round's vocab, frequency-weighted:
    * (a, b, cnt). */
  private def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(col("w"), " ")
    words
      .select(col("n"), explode(arrays_zip(
        slice(syms, lit(1), size(syms) - 1).as("a"),
        slice(syms, lit(2), size(syms) - 1).as("b"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** Train `rounds` merges; returns (merge table DataFrame, final
    * merged vocab (w, n) — CACHED, caller unpersists). The merge
    * table is (round, left_sym, right_sym, pair_count) in election
    * order.
    */
  def trainWithVocab(
      docs: DataFrame, rounds: Int = MergeRounds): (DataFrame, DataFrame) =
    trainLoop(docs, rounds, minPairCount = 1L)

  /** Train to CONVERGENCE rather than a fixed round budget — the
    * production stop rule (Sennrich trains to a vocab size / count
    * floor, not 8 rounds): merge until the BEST adjacent-pair count
    * drops below `minPairCount` (merging near-singleton pairs just
    * memorizes words) or `maxMerges` merges landed — the budget
    * backstop that bounds driver elections. Election, tie-break, and
    * merge-apply are byte-identical to [[trainWithVocab]]: whenever
    * every elected count clears the floor within the budget, the two
    * variants produce the SAME merge table (spec-pinned on the gate
    * corpus), so the gated unrolled oracle keeps covering this loop.
    */
  def trainToConvergence(
      docs: DataFrame, minPairCount: Long = 2L,
      maxMerges: Int = 10000): (DataFrame, DataFrame) =
    trainLoop(docs, maxMerges, minPairCount)

  private def trainLoop(
      docs: DataFrame, rounds: Int, minPairCount: Long): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    // ONE cached base; per-round merges chain LAZILY on top of it. A
    // round's election recomputes the (tiny, cached) vocab's replace
    // chain instead of paying a cache+count materialization job per
    // round — re-materialize only every `Rebase` merges to keep the
    // lineage (and per-election planning) bounded for the
    // to-convergence variant's thousands of rounds.
    val Rebase = 16
    var base = vocab0(docs).cache()
    var chainLen = 0
    var words = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // 1 row: the elected pair
      if (top.isEmpty || top(0).getLong(2) < minPairCount) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, cnt))
        words = words
          .withColumn("w", replace(col("w"), lit(s"$a $b"), lit(a + b)))
        chainLen += 1
        if (chainLen >= Rebase) {
          val next = words.cache()
          next.count() // materialize before dropping the parent
          base.unpersist()
          base = next
          words = next
          chainLen = 0
        }
      }
      r += 1
    }
    // Materialize the FINAL vocab once (callers read it repeatedly).
    val out = if (chainLen == 0) words else {
      val next = words.cache()
      next.count()
      base.unpersist()
      next
    }
    import spark.implicits._
    val mergesDf = merges.toSeq.toDF("round", "left_sym", "right_sym", "pair_count")
      .orderBy(col("round"))
    (mergesDf, out)
  }

  /** Train `rounds` merges; returns (round, left_sym, right_sym,
    * pair_count) — the merge table in election order.
    */
  def train(docs: DataFrame, rounds: Int = MergeRounds): DataFrame = {
    // The merge table is built from the driver-side election buffer,
    // so the working vocab can drop immediately.
    val (mergesDf, words) = trainWithVocab(docs, rounds)
    words.unpersist()
    mergesDf
  }

  def d30BpeTrain(spark: SparkSession, dir: String): DataFrame =
    train(Tables.documents(spark, dir))

  /** d31: TOKENIZE with the learned merges — the apply half of the
    * BPE lifecycle (d30 trains, this consumes). Because merge
    * application is per-WORD and the trainer's working vocab IS the
    * per-word merge result, corpus token statistics read directly off
    * the final vocab: token frequency = Σ word-frequency over words
    * containing the token. One explode + groupBy over the (already
    * saturating) vocab — no second corpus pass at all, which is the
    * whole point of vocab-space training at 100 TB.
    *
    * Output: top-20 tokens by corpus frequency (freq DESC, token ASC
    * tie-break) — the "what did the tokenizer learn" report.
    */
  def d31BpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val (_, words) = trainWithVocab(Tables.documents(spark, dir))
    val out = words
      .select(explode(split(col("w"), " ")).as("token"), col("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)
      .localCheckpoint(true) // materialize before unpersisting the vocab
    words.unpersist()
    out
  }

  /** Apply an ALREADY-TRAINED merge list to a corpus — the deployment
    * shape (ship the tokenizer, not the trainer): char-split the
    * word-frequency vocab, then chain one `replace` per merge IN
    * ELECTION ORDER. Unlike training there are NO driver round-trips:
    * the 8 replaces compose into one narrow pipeline over the vocab —
    * a single distributed pass whatever the corpus size.
    */
  def applyMerges(
      docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(vocab0(docs)) { case (v, (a, b)) =>
      v.withColumn("w", replace(col("w"), lit(s"$a $b"), lit(a + b)))
    }

  /** d33: TOKENIZE WITH STORED MERGES — the persisted-tokenizer
    * lifecycle: d30's merge table lives in a GraftLake table (rounds
    * in election order, the tokenizer artifact), and application
    * loads the O(rounds) rows back and runs [[applyMerges]] on the
    * corpus — no retraining, no per-round driver elections, exactly
    * how a deployed BPE tokenizer consumes its shipped merges.
    * Output = d31's top-20 report, so d31's oracle gates the whole
    * persist → reload → apply path.
    */
  def d33BpeStored(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.GraftLake
    val mergesPath = graft.SparkEntry.scratch("graft_bpe_merges", dir)
    graft.SparkEntry.rmrf(mergesPath)
    GraftLake.create(train(Tables.documents(spark, dir)), mergesPath)
    val stored = GraftLake.read(spark, mergesPath).orderBy(col("round"))
      .collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq
    applyMerges(Tables.documents(spark, dir), stored)
      .select(explode(split(col("w"), " ")).as("token"), col("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)
  }

  /** Replays the identical training chain (shared CTE text), then
    * reads token frequencies off the final vocab exactly like the
    * Spark side.
    */
  def d31OracleSql: String = {
    val chain = oracleChainSql
    s"""$chain
       |SELECT token, CAST(sum(n) AS BIGINT) AS freq FROM (
       |  SELECT unnest(string_split(w, ' ')) AS token, n
       |  FROM v$MergeRounds)
       |GROUP BY token
       |ORDER BY freq DESC, token
       |LIMIT 20""".stripMargin
  }

  /** The unrolled DuckDB replay: v0 = char-split word-frequency
    * vocab; per round k, p_k = weighted adjacent-pair counts, m_k =
    * the elected pair (count DESC, (a,b) ASC), v_k = `replace`-merged
    * vocab. All CTEs MATERIALIZED — each round references its
    * predecessor multiple times and the chain is 8 deep.
    *
    * Assumes the corpus yields ≥ `MergeRounds` merges (true for any
    * natural-language corpus; the Spark side stops early on
    * exhaustion, which would surface as a row-count mismatch).
    */
  /** The shared WITH-chain: v0 (char-split word-frequency vocab),
    * then per round k the pair counts p_k, elected merge m_k, merged
    * vocab v_k.
    */
  private def oracleChainSql: String = {
    val rounds = (1 to MergeRounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT pr['a'] AS a, pr['b'] AS b, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT unnest([{'a': syms[i], 'b': syms[i+1]}
         |                   FOR i IN range(1, len(syms))]) AS pr, n
         |    FROM (SELECT string_split(w, ' ') AS syms, n FROM v${k - 1}) t)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (
         |  SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT replace(w, m.a || ' ' || m.b, m.a || m.b) AS w, n
         |  FROM v${k - 1}, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH
       |v0 AS MATERIALIZED (
       |  SELECT array_to_string([word[i:i] FOR i IN range(1, length(word)+1)], ' ') AS w,
       |         count(*) AS n
       |  FROM (SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) > 0
       |  GROUP BY word),
       |$rounds""".stripMargin
  }

  def d30OracleSql: String = {
    val union = (1 to MergeRounds)
      .map(k => s"SELECT $k AS round, a AS left_sym, b AS right_sym, cnt AS pair_count FROM m$k")
      .mkString("\n  UNION ALL\n  ")
    s"""${oracleChainSql}
       |SELECT * FROM (
       |  $union
       |) ORDER BY round""".stripMargin
  }
}
