package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** UNIGRAM-LM (SentencePiece-style) subword tokenizer TRAINING — the
  * standard alternative to BPE (d30–d33): seed a candidate piece
  * vocabulary from corpus substrings, then EM-refine piece scores by
  * re-segmenting the corpus under the current scores and re-counting
  * piece usage, pruning pieces that fall out of use (Kudo 2018's
  * EM + prune loop, hard-EM/Viterbi variant).
  *
  * Distributed the way the BPE family runs (see [[Bpe]]): ONE
  * corpus-sized pass builds the word-frequency vocabulary; every
  * later pass — candidate counting, segmentation, usage counting —
  * runs on the VOCAB (which saturates: 100 TB of text has the same
  * few-million-type tail as 1 TB) with the O(256)-entry piece table
  * BROADCAST. No driver round-trips inside a round at all; the only
  * collects are the bounded piece table (≤ 256 + alphabet rows).
  *
  * EXACT integer arithmetic so the DuckDB oracle replays
  * byte-identically (the d36/d41 "no-ln" discipline):
  *   - piece score = `length(bin(usage))` — the whole-bit log both
  *     engines compute identically (bin(0) = "0", so an unused
  *     coverage char scores 1);
  *   - Viterbi segmentation maximizes Σ (score − 64) — the −64
  *     per-piece cost is the integer image of the − log Σ
  *     normalizer, making FEWER pieces dominate, then higher
  *     corpus-frequency pieces;
  *   - DP ties break on the lexicographically SMALLEST path string
  *     (ASCII, so Scala UTF-16 compare == DuckDB byte compare) —
  *     the segmentation is a deterministic pure function of the
  *     piece table, no backpointer ambiguity to drift.
  *
  * Words are lowercased [a-z0-9]+ runs of length ≤ [[MaxWordLen]]
  * (the rare long tail is excluded from TRAINING, the standard
  * sentence-piece posture); pieces are substrings of length ≤
  * [[MaxPieceLen]]. The oracle unrolls the DP over exactly
  * MaxWordLen positions, so the bound is part of the algorithm, not
  * a convenience.
  */
object Unigram {

  val MaxWordLen = 16
  val MaxPieceLen = 4
  val SeedVocab = 256 // top-K seed candidates (+ alphabet coverage)
  val PieceCost = 64L // integer -log-normalizer: fewer pieces dominate

  /** Word-frequency vocabulary: (w, n), lowercased [a-z0-9]+ runs,
    * training-length bound applied.
    */
  private def vocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(
        regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), " ")).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** All (piece, n) substring occurrences of the vocab, counted WITH
    * multiplicity and weighted by word frequency — the seed counts.
    */
  private def candidateCounts(v: DataFrame): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    v.select(col("w"), col("n")).as[(String, Long)]
      .flatMap { case (w, n) =>
        for {
          i <- 0 until w.length
          k <- 1 to math.min(MaxPieceLen, w.length - i)
        } yield (w.substring(i, i + k), n)
      }
      .toDF("piece", "n")
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
  }

  /** The SEED piece table: top-[[SeedVocab]] candidates by
    * (cnt DESC, piece ASC) plus EVERY single character (coverage —
    * the DP must always have a feasible step). (piece, cnt).
    */
  private def seedPieces(cands: DataFrame): DataFrame = {
    val top = cands.orderBy(col("cnt").desc, col("piece")).limit(SeedVocab)
    val chars = cands.filter(length(col("piece")) === 1)
    top.union(chars).distinct()
  }

  /** Viterbi-segment `w` under broadcast `scores`: maximize
    * Σ (score − PieceCost), ties to the lexicographically smallest
    * path. Returns the piece sequence. Single-char coverage makes
    * every position feasible.
    */
  private[graft] def segment(
      w: String, scores: scala.collection.Map[String, Long]): Seq[String] = {
    val n = w.length
    val bestSc = new Array[Long](n + 1)
    val bestPath = new Array[String](n + 1)
    bestPath(0) = ""
    var i = 1
    while (i <= n) {
      var cs = Long.MinValue
      var cp: String = null
      var k = 1
      while (k <= MaxPieceLen && k <= i) {
        if (bestPath(i - k) != null) {
          val piece = w.substring(i - k, i)
          scores.get(piece) match {
            case Some(s) =>
              val sc = bestSc(i - k) + s - PieceCost
              val path = bestPath(i - k) + "," + piece
              if (cp == null || sc > cs || (sc == cs && path < cp)) {
                cs = sc; cp = path
              }
            case None => ()
          }
        }
        k += 1
      }
      bestSc(i) = cs
      bestPath(i) = cp
      i += 1
    }
    bestPath(n).substring(1).split(",").toSeq
  }

  /** Whole-bit log score of a usage count: `length(bin(u))`. */
  private def bitsOf(u: Long): Long =
    java.lang.Long.toBinaryString(u).length.toLong

  // ------------------------------------------------- byte fallback

  /** UTF-8 bytes of one code point by PURE INTEGER ARITHMETIC —
    * bit-identical to `String.getBytes(UTF_8)` (spec-pinned against
    * the JDK across all four length classes), and replayable in any
    * engine as div/mod on the code point (the d45 oracle's form).
    */
  private[graft] def utf8Bytes(cp: Int): Seq[Int] =
    if (cp < 0x80) Seq(cp)
    else if (cp < 0x800) Seq(0xC0 + cp / 64, 0x80 + cp % 64)
    else if (cp < 0x10000)
      Seq(0xE0 + cp / 4096, 0x80 + (cp / 64) % 64, 0x80 + cp % 64)
    else Seq(0xF0 + cp / 262144, 0x80 + (cp / 4096) % 64,
      0x80 + (cp / 64) % 64, 0x80 + cp % 64)

  private[graft] def byteToken(b: Int): String = f"<0x$b%02X>"

  /** GPT-2-style BYTE-FALLBACK apply leg: characters the piece table
    * covers segment via Viterbi over maximal covered runs; every
    * OTHER character — any script, any byte sequence — emits its
    * UTF-8 bytes as `<0xNN>` tokens. Makes the tokenizer TOTAL:
    * every string segments with zero loss
    * (`detokenize(segmentByteFallback(w)) == w`, spec-pinned), the
    * guarantee a word-alphabet vocabulary alone cannot give.
    */
  private[graft] def segmentByteFallback(
      w: String, scores: scala.collection.Map[String, Long]): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = w.length
    var i = 0
    while (i < n) {
      if (scores.contains(w.substring(i, i + 1))) {
        var j = i + 1
        while (j < n && scores.contains(w.substring(j, j + 1))) j += 1
        out ++= segment(w.substring(i, j), scores)
        i = j
      } else {
        // half a surrogate pair is never a covered char, so the
        // code-point step always lands here intact
        val cp = w.codePointAt(i)
        utf8Bytes(cp).foreach(b => out += byteToken(b))
        i += Character.charCount(cp)
      }
    }
    out.result()
  }

  /** Inverse of [[segmentByteFallback]]: consecutive `<0xNN>` tokens
    * re-assemble to bytes and decode as UTF-8; piece tokens append
    * verbatim.
    */
  private[graft] def detokenize(tokens: Seq[String]): String = {
    val sb = new java.lang.StringBuilder()
    val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    def flush(): Unit = if (bytes.nonEmpty) {
      sb.append(new String(bytes.toArray,
        java.nio.charset.StandardCharsets.UTF_8))
      bytes.clear()
    }
    tokens.foreach { t =>
      if (t.length == 6 && t.startsWith("<0x") && t.endsWith(">"))
        bytes += Integer.parseInt(t.substring(3, 5), 16).toByte
      else { flush(); sb.append(t) }
    }
    flush()
    sb.toString
  }

  /** One EM round: segment the vocab under `scores` (a bounded
    * broadcastable map), return frequency-weighted piece usage
    * (piece, u). Pieces that fall out of use simply don't appear —
    * that IS the prune.
    */
  private def usageUnder(
      v: DataFrame, scores: scala.collection.Map[String, Long]): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(scores)
    v.select(col("w"), col("n")).as[(String, Long)]
      .flatMap { case (w, n) => segment(w, b.value).map(p => (p, n)) }
      .toDF("piece", "n")
      .groupBy(col("piece")).agg(sum(col("n")).as("u"))
  }

  /** Train two EM rounds; returns the final piece table
    * (piece, freq, score) where freq is round-2 usage and score its
    * whole-bit log — plus the round-2 scores map for [[apply]]-side
    * reuse. All collects are O(SeedVocab + alphabet).
    */
  private def trainPieces(docs: DataFrame)
      : (DataFrame, scala.collection.Map[String, Long], DataFrame) = {
    val v = vocab(docs).cache()
    v.count()
    val seed = seedPieces(candidateCounts(v))
    val scores0: Map[String, Long] = seed.collect()
      .map(r => r.getString(0) -> bitsOf(r.getLong(1))).toMap
    val chars = scores0.keySet.filter(_.length == 1)
    // round 1: usage under seed scores; prune + re-score; chars kept
    // for coverage even at zero usage (bin(0)="0" scores 1)
    val u1: Map[String, Long] = usageUnder(v, scores0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val scores1: Map[String, Long] =
      u1.map { case (p, u) => p -> bitsOf(u) } ++
        chars.filterNot(u1.contains).map(_ -> bitsOf(0L)).toMap
    // round 2: usage under the refined scores — the final counts
    val u2 = usageUnder(v, scores1).cache()
    u2.count()
    val pieces = u2.select(col("piece"), col("u").as("freq"),
      length(bin(col("u"))).cast("long").as("score"))
    (pieces, scores1, v)
  }

  /** Train to CONVERGENCE rather than the fixed two EM rounds — the
    * production stop rule (Kudo's EM+prune iterates until the
    * likelihood stabilizes; the integer image of that is a SCORE
    * TABLE fixpoint: one more segment-and-rescore round reproduces
    * the table exactly). Segmentation, scoring, and tie-breaks are
    * byte-identical to [[trainPieces]], so when the fixpoint lands by
    * round 2 — as on the gate corpus, spec-pinned — the converged
    * piece table IS the d42 table and the gated unrolled oracle
    * covers this loop too. `maxRounds` bounds the driver elections
    * (each round is one distributed vocab pass + an O(256) collect).
    * Returns (pieces as (piece, freq, score), rounds run, converged).
    */
  def trainToConvergence(docs: DataFrame, maxRounds: Int = 16)
      : (DataFrame, Int, Boolean) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val v = vocab(docs).cache()
    v.count()
    val seed = seedPieces(candidateCounts(v))
    var scores: Map[String, Long] = seed.collect()
      .map(r => r.getString(0) -> bitsOf(r.getLong(1))).toMap
    val chars = scores.keySet.filter(_.length == 1)
    var rounds = 0
    var converged = false
    var lastUsage: Map[String, Long] = Map.empty
    while (rounds < maxRounds && !converged) {
      val u: Map[String, Long] = usageUnder(v, scores).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val next: Map[String, Long] =
        u.map { case (p, c) => p -> bitsOf(c) } ++
          chars.filterNot(u.contains).map(_ -> bitsOf(0L)).toMap
      rounds += 1
      lastUsage = u
      if (next == scores) converged = true else scores = next
    }
    val pieces = lastUsage.toSeq.toDF("piece", "freq")
      .select(col("piece"), col("freq"),
        length(bin(col("freq"))).cast("long").as("score"))
      .localCheckpoint(true)
    v.unpersist()
    (pieces, rounds, converged)
  }

  /** d42: TRAIN — the learned piece table, top-32 by round-2 corpus
    * frequency (freq DESC, piece ASC).
    */
  def d42UnigramTrain(spark: SparkSession, dir: String): DataFrame = {
    val (pieces, _, v) = trainPieces(Tables.documents(spark, dir))
    val out = pieces
      .orderBy(col("freq").desc, col("piece"))
      .limit(32)
      .localCheckpoint(true)
    v.unpersist()
    out
  }

  /** d43: APPLY WITH STORED PIECES — the deployment lifecycle (ship
    * the tokenizer, not the trainer): the trained round-1 score
    * table persists to a GraftLake table, application loads the
    * O(pieces) rows back, broadcasts them, and segments the corpus
    * vocabulary in ONE distributed pass. Output: tokens-per-word by
    * word length — (wlen, words, pieces) — the compression report a
    * tokenizer ships with.
    */
  def d43UnigramApply(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.GraftLake
    val docs = Tables.documents(spark, dir)
    val (_, scores1, v) = trainPieces(docs)
    val piecesPath = graft.SparkEntry.scratch("graft_unigram_pieces", dir)
    graft.SparkEntry.rmrf(piecesPath)
    import spark.implicits._
    GraftLake.create(
      scores1.toSeq.toDF("piece", "score"), piecesPath)
    val stored: Map[String, Long] = GraftLake.read(spark, piecesPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = spark.sparkContext.broadcast(stored)
    val out = v.select(col("w"), col("n")).as[(String, Long)]
      .map { case (w, n) =>
        (w.length.toLong, n, n * segment(w, b.value).length.toLong)
      }
      .toDF("wlen", "words", "pieces")
      .groupBy(col("wlen"))
      .agg(sum(col("words")).as("words"), sum(col("pieces")).as("pieces"))
      .orderBy(col("wlen"))
      .localCheckpoint(true)
    v.unpersist()
    out
  }

  /** d45: BYTE-FALLBACK TOKENIZATION — the apply leg made TOTAL.
    * Stored pieces train as d43; the tokenized stream is the vocab
    * with one deterministic OUT-OF-ALPHABET prefix character per word
    * (the corpus is pure `[a-z0-9 ]`, so OOV-ness must be synthesized
    * to be gateable): the shared Horner hash picks a code point in
    * the 2-, 3-, or 4-byte UTF-8 class (surrogate range excluded).
    * The REAL segmenter runs over the real strings; output is the
    * fallback byte histogram `(byte, cnt)` plus one `(-1, total
    * piece tokens)` row. The oracle replays the bytes as div/mod
    * arithmetic on the same hash and the pieces through the unrolled
    * DP — bit-identical without ever materializing a char in SQL.
    */
  def d45ByteFallback(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val (_, scores1, v) = trainPieces(docs)
    val b = spark.sparkContext.broadcast(scores1)
    val out = v.select(col("w"), col("n")).as[(String, Long)]
      .flatMap { case (w, n) =>
        val h = Dedup.polyHash(w)
        val cp = (h % 3L) match {
          case 0L => 161 + (h % 1887L).toInt // 2-byte: U+00A1..U+07FF
          case 1L => 2048 + (h % 53248L).toInt // 3-byte, below surrogates
          case _ => 65536 + (h % 4096L).toInt // 4-byte
        }
        val synth = new String(Character.toChars(cp)) + w
        segmentByteFallback(synth, b.value).map { t =>
          if (t.startsWith("<0x"))
            (Integer.parseInt(t.substring(3, 5), 16).toLong, n)
          else (-1L, n)
        }
      }
      .toDF("byte", "cnt0")
      .groupBy(col("byte")).agg(sum(col("cnt0")).as("cnt"))
      .orderBy(col("byte"))
      .localCheckpoint(true)
    v.unpersist()
    out
  }

  // ------------------------------------------------------------ oracle

  /** The shared DuckDB chain: v (word vocab), cands/pieces1 (seed),
    * round-1 DP (b1_1..b1_16) → best1 → u1/pieces2, round-2 DP
    * (b2_1..b2_16) → best2 → u2. The DP is UNROLLED over exactly
    * MaxWordLen positions; each cell keeps (score, path) and ties
    * break on the path string — byte-identical to [[segment]].
    */
  private def dpChain(tag: String, piecesRel: String): String = {
    val steps = (1 to MaxWordLen).map { i =>
      val prevs = (1 to MaxPieceLen).filter(_ <= i).map { k =>
        val prev = if (i - k == 0) s"${tag}_0" else s"${tag}_${i - k}"
        s"""SELECT w, n, sc, path, $k AS k FROM $prev WHERE length(w) >= $i"""
      }.mkString("\n      UNION ALL ")
      s"""${tag}_$i AS MATERIALIZED (
         |  SELECT w, n, sc, path FROM (
         |    SELECT c.w, c.n, c.sc + p.score - ${PieceCost} AS sc,
         |      c.path || ',' || p.piece AS path,
         |      row_number() OVER (PARTITION BY c.w
         |        ORDER BY c.sc + p.score DESC, c.path || ',' || p.piece) AS rn
         |    FROM (
         |      $prevs) c
         |    JOIN $piecesRel p
         |      ON length(p.piece) = c.k
         |     AND p.piece = substr(c.w, $i - c.k + 1, c.k))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val bests = (1 to MaxWordLen)
      .map(i => s"SELECT w, n, substr(path, 2) AS path FROM ${tag}_$i WHERE length(w) = $i")
      .mkString("\n  UNION ALL ")
    s"""${tag}_0 AS MATERIALIZED (
       |  SELECT w, n, CAST(0 AS BIGINT) AS sc, '' AS path FROM v),
       |$steps,
       |${tag}_best AS MATERIALIZED (
       |  $bests)""".stripMargin
  }

  private def chainSql: String =
    s"""WITH
       |v AS MATERIALIZED (
       |  SELECT word AS w, count(*) AS n
       |  FROM (SELECT unnest(string_split(
       |          regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen
       |  GROUP BY word),
       |cands AS MATERIALIZED (
       |  SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(flatten([[substr(w, i, k)
       |        FOR k IN range(1, least($MaxPieceLen, length(w) - i + 1) + 1)]
       |        FOR i IN range(1, length(w) + 1)])) AS piece, n
       |    FROM v)
       |  GROUP BY piece),
       |pieces1 AS MATERIALIZED (
       |  SELECT piece, length(bin(cnt)) AS score FROM (
       |    SELECT piece, cnt FROM
       |      (SELECT piece, cnt FROM cands ORDER BY cnt DESC, piece LIMIT $SeedVocab)
       |    UNION
       |    SELECT piece, cnt FROM cands WHERE length(piece) = 1)),
       |${dpChain("b1", "pieces1")},
       |u1 AS MATERIALIZED (
       |  SELECT piece, CAST(sum(n) AS BIGINT) AS u FROM (
       |    SELECT unnest(string_split(path, ',')) AS piece, n FROM b1_best)
       |  GROUP BY piece),
       |pieces2 AS MATERIALIZED (
       |  SELECT piece, length(bin(u)) AS score FROM u1
       |  UNION ALL
       |  SELECT p.piece, length(bin(0)) AS score
       |  FROM pieces1 p LEFT JOIN u1 ON u1.piece = p.piece
       |  WHERE length(p.piece) = 1 AND u1.piece IS NULL),
       |${dpChain("b2", "pieces2")},
       |u2 AS MATERIALIZED (
       |  SELECT piece, CAST(sum(n) AS BIGINT) AS u FROM (
       |    SELECT unnest(string_split(path, ',')) AS piece, n FROM b2_best)
       |  GROUP BY piece)""".stripMargin

  def d42OracleSql: String =
    s"""$chainSql
       |SELECT piece, u AS freq, CAST(length(bin(u)) AS BIGINT) AS score
       |FROM u2
       |ORDER BY freq DESC, piece
       |LIMIT 32""".stripMargin

  def d43OracleSql: String =
    s"""$chainSql
       |SELECT CAST(length(w) AS BIGINT) AS wlen,
       |  CAST(sum(n) AS BIGINT) AS words,
       |  CAST(sum(n * (length(path) - length(replace(path, ',', '')) + 1))
       |    AS BIGINT) AS pieces
       |FROM b2_best
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** d45 oracle: the Horner hash picks the prefix code point, div/mod
    * arithmetic expands its UTF-8 bytes, and the b2 DP supplies the
    * in-alphabet piece counts — all integer, no chr()/encode() needed.
    */
  def d45OracleSql: String =
    s"""$chainSql,
       |hh AS MATERIALIZED (
       |  SELECT w, n,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CAST(unicode(w[i:i]) AS BIGINT) FOR i IN range(1, length(w) + 1)]),
       |      (a, c) -> (a * 131 + c) % 1000000007) AS h
       |  FROM v),
       |cps AS (
       |  SELECT n, CASE
       |    WHEN h % 3 = 0 THEN 161 + h % 1887
       |    WHEN h % 3 = 1 THEN 2048 + h % 53248
       |    ELSE 65536 + h % 4096 END AS cp
       |  FROM hh),
       |fb AS (
       |  SELECT unnest(CASE
       |    WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
       |    WHEN cp < 65536 THEN
       |      [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64]
       |    ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
       |      128 + (cp // 64) % 64, 128 + cp % 64] END) AS byte, n
       |  FROM cps),
       |ptoks AS (
       |  SELECT CAST(-1 AS BIGINT) AS byte,
       |    n * (length(path) - length(replace(path, ',', '')) + 1) AS n
       |  FROM b2_best)
       |SELECT byte, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |  SELECT CAST(byte AS BIGINT) AS byte, n FROM fb
       |  UNION ALL SELECT byte, n FROM ptoks)
       |GROUP BY byte ORDER BY byte""".stripMargin
}
