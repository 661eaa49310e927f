package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Near-duplicate detection (SURVEY.md §2: d06..d08, d10).
  *
  * Scale design: both MinHash-LSH and SimHash are strictly
  * O(n) signature passes + an equi-join on bucket keys — never an
  * O(n^2) pairwise compare. The expensive verify (exact Jaccard /
  * hamming) runs only on bucket-collided candidate pairs. Candidate
  * pairs carry only ids through the shuffle; payloads are re-joined
  * afterwards. Matched pairs collapse to per-component canonical ids
  * via [[canonicalizeComponents]].
  *
  * All hash functions are polynomial/affine modular arithmetic (not
  * JVM-private hashes) so the driver's DuckDB oracle can replay the
  * ENTIRE pipeline — signatures, banding, candidate generation, verify
  * and canonicalization — and hash-compare the result. See
  * [[d06OracleSql]] / [[d07OracleSql]].
  */
object Dedup {

  /** Modulus for all mod-p hashing (fits products in a Long). */
  val M: Long = 1000000007L
  /** Horner base for string hashes. */
  val StrBase: Long = 131L
  /** Horner base for band (signature-combining) hashes. */
  val BandBase: Long = 1000003L

  val NPerms = 32
  val NBands = 8
  val BandRows = 4 // NPerms / NBands

  /** Affine "permutation" family h_i(x) = (A_i x + B_i) mod M, with
    * fixed-seed constants (inlined into the DuckDB oracle).
    */
  private[operators] val (permA, permB): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(271828)
    val a = Array.fill(NPerms)(1L + rnd.nextInt((M - 1).toInt))
    val b = Array.fill(NPerms)(rnd.nextInt(M.toInt).toLong)
    (a, b)
  }

  /** Horner base-131 hash of a string, mod M. */
  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * StrBase + s.charAt(i)) % M; i += 1 }
    h
  }

  private def bandHash(sig: Array[Long], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * BandBase + sig(i)) % M; i += 1 }
    h
  }

  private[graft] def shinglesOf(text: String): Array[String] = {
    val toks = text.trim.toLowerCase.split(" ")
    (if (toks.length < 3) Array(toks.mkString(" "))
     else toks.sliding(3).map(_.mkString(" ")).toArray).distinct
  }

  /** One-pass MinHash signature computation per document: distinct
    * 3-word shingles → NPerms affine-permutation minima → NBands bands.
    *
    * Deliberately a typed `map`, not nested Catalyst lambdas: Catalyst
    * inlines aliased expressions into higher-order-function bodies
    * (CollapseProject has no CSE there), which re-evaluates the
    * tokenizer per shingle x per permutation x per band — a
    * combinatorial blowup. One JVM pass is O(shingles x NPerms) and
    * shuffles nothing.
    */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .map { case (id, text) =>
        val sh = shinglesOf(text)
        val base = sh.map(polyHash)
        val sig = Array.tabulate(NPerms) { p =>
          var m = Long.MaxValue
          base.foreach { h => val v = (permA(p) * h + permB(p)) % M; if (v < m) m = v }
          m
        }
        val bands = Array.tabulate(NBands)(b =>
          bandHash(sig, b * BandRows, b * BandRows + BandRows))
        (id, sh, bands)
      }
      .toDF("doc_id", "shingles", "bands")
  }

  /** Exploded LSH band rows of a (doc_id, text) frame:
    * (doc_id, band_idx [1-based, matching the oracle's `e` CTE],
    * band_hash) — the row shape a persisted band INDEX stores. One
    * typed map pass per doc; O(NBands) rows out per doc.
    */
  private[graft] def bandRowsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Par.fanOut(docs
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .flatMap { case (id, text) =>
        val base = shinglesOf(text).map(polyHash)
        val sig = Array.tabulate(NPerms) { p =>
          var m = Long.MaxValue
          base.foreach { h => val v = (permA(p) * h + permB(p)) % M; if (v < m) m = v }
          m
        }
        Array.tabulate(NBands)(b =>
          (id, b + 1, bandHash(sig, b * BandRows, b * BandRows + BandRows)))
      }
      .toDF("doc_id", "band_idx", "band_hash")
  }

  /** The `t → … → e` prefix of [[minhashCandSql]] (band rows per doc)
    * for oracles that consume the band INDEX shape rather than the
    * candidate-pair join.
    */
  private[graft] def minhashBandRowsSql: String = minhashCandSql

  /** Connected-component canonicalization: map every node to the
    * minimum id in its match-graph component, so transitive chains
    * A~B~C collapse to one canonical id (a single min-partner pass
    * would leave them split).
    *
    * Iterative min-label propagation with pointer jumping: per round,
    * label(x) := min(label(x), min over neighbors' labels,
    * label(label(x))). The neighbor step moves labels one hop, the
    * pointer jump halves chain depth, so convergence is
    * O(log(diameter)) rounds; near-dup components are tiny, so 2-3
    * rounds in practice. Every round is joins + partial-agg min — the
    * alternating large-star/small-star shape — and the loop is bounded.
    * localCheckpoint truncates lineage between rounds (a reliable
    * checkpoint dir in production).
    *
    * @param nodes one column `id`; @param edges columns `a`, `b`.
    * @return (id, canonical_id)
    */
  /** Above this many (undirected) match edges the driver union-find
    * path gives way to distributed label propagation — the same
    * adaptive cutoff logic as broadcast-vs-shuffle join selection.
    * DERIVED from driver memory instead of a magic constant: a
    * collected edge costs ~200 bytes (boxed Tuple2 + union-find map
    * entry + path-compression churn), and the collect may take at
    * most ~10% of the heap, so limit = maxMemory / 2000 — floored at
    * 500k (always worth a driver pass) and capped at 8M (beyond
    * that the distributed path's per-round cost is trivially
    * amortized anyway).
    */
  val DriverCCEdgeLimit: Long =
    math.min(8000000L,
      math.max(500000L, Runtime.getRuntime.maxMemory() / 2000L))

  /** localCheckpoint + REBUILD from the checkpointed RDD: truncates
    * lineage like a plain eager localCheckpoint, but also RESETS the
    * plan's size-in-bytes statistics. A checkpointed Dataset inherits
    * its origin plan's estimate; inside an iterative join loop the
    * next round SQUARES it (join size estimates multiply), so by
    * round ~25 Catalyst is multiplying million-digit BigIntegers in
    * SizeInBytesOnlyStatsPlanVisitor and planning time dwarfs the
    * actual work. Rebuilding from the RDD pins every round to the
    * session default estimate — O(1) stats per round, forever.
    */
  private[graft] def flatCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  private[graft] def canonicalizeComponents(
      nodes: DataFrame, edges: DataFrame, maxIters: Int = 40,
      driverEdgeLimit: Long = DriverCCEdgeLimit): DataFrame = {
    val sym = edges.select(col("a").as("x"), col("b").as("y"))
      .union(edges.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(true)
    // Fast path: no matches at all (common for clean corpora) — skip
    // the propagation loop's join/count rounds entirely.
    if (sym.isEmpty) {
      return nodes.select(col("id"), col("id").as("canonical_id"))
    }
    // Small-graph path: near-dup match graphs are usually orders of
    // magnitude smaller than the corpus, so below the cutoff a driver
    // union-find + one broadcast map-back replaces ~3 jobs PER
    // PROPAGATION ROUND with 2 jobs total. The iterative path below
    // remains the unbounded-scale fallback (forced in specs).
    // (sym is localCheckpoint'ed, so counting/collecting it never
    // recomputes the upstream candidate-verify pipeline.)
    if (sym.count() <= 2 * driverEdgeLimit) {
      val es = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // Smaller id becomes the root, so every root IS its
        // component's minimum — the canonical id by definition.
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = es.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(x => (x, find(x)))
      val spark = nodes.sparkSession
      import spark.implicits._
      return nodes
        .join(broadcast(labels.toSeq.toDF("id", "cc_label")), Seq("id"), "left")
        .select(col("id"), coalesce(col("cc_label"), col("id")).as("canonical_id"))
    }
    // Propagate over MATCHED nodes only (edge endpoints): the label
    // tables are O(|matched|), not O(|corpus|) — at 100 TB the near-dup
    // graph is orders of magnitude smaller than the corpus, so every
    // per-round join shrinks accordingly. Untouched nodes map to
    // themselves in one final left join against the full node set.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).collect().head.getDecimal(0)
    var labels = flatCheckpoint(sym.select(col("x").as("id")).distinct()
      .select(col("id"), col("id").as("label")))
    // Labels only ever decrease, so the round changed something iff the
    // label sum strictly dropped — one partial agg per round instead of
    // a join + count against the previous round's table. No initial sum
    // job: round 1 always changes labels when edges exist (the larger
    // endpoint of any edge takes a smaller label), so the first
    // comparison is against round 1's sum.
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("y"), col("label").as("ylab")), "y")
        .groupBy(col("x")).agg(min(col("ylab")).as("nbr"))
        .select(col("x").as("id"), col("nbr"))
      val jumped = labels
        .join(
          labels.select(col("id").as("label"), col("label").as("jlab")),
          Seq("label"), "left")
      val next = flatCheckpoint(jumped
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(
            col("label"),
            coalesce(col("jlab"), col("label")),
            coalesce(col("nbr"), col("label"))).as("label")))
      val s = labelSum(next)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      it += 1
    }
    // With pointer jumping, non-convergence needs a component diameter
    // ~2^maxIters — pathological, but returning silently-wrong canonical
    // ids would be worse than failing loudly.
    require(converged,
      s"connected-components did not converge in $maxIters rounds — raise maxIters")
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("canonical_id"))
  }

  /** d06: MinHash + LSH near-dup dedup.
    * Output: every doc with the canonical (minimum) id of its near-dup
    * component — docs with no near-dup map to themselves.
    */
  def d06DedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(spark, dir)
    val bands = sigs
      .select(col("doc_id"), posexplode(col("bands")))
      .toDF("doc_id", "band_idx", "band_hash")

    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val shA = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val dups = cand
      .join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jacc", TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= 0.5)

    canonicalizeComponents(
      sigs.select(col("doc_id").as("id")),
      dups.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("canonical_id"))
      .orderBy("doc_id")
  }

  /** splitmix64-style finalizer over a base-31 Horner word hash: the
    * Horner pass alone leaves short words in the low bits only (useless
    * for per-bit votes); the finalizer avalanches all 64. Pure wrapping
    * Long arithmetic — replayable in DuckDB via UHUGEINT mod 2^64.
    */
  def wordHash64(w: String): Long = {
    var h = 0L
    var i = 0
    while (i < w.length) { h = h * 31 + w.charAt(i); i += 1 }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Classic SimHash: per-bit vote of all word hashes. */
  def simhash64(toks: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { w =>
      val h = wordHash64(w)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** d07: SimHash near-dup dedup. Bucket by the four 16-bit chunks
    * (any chunk equal → candidate), verify hamming <= 6, canonicalize
    * per connected component.
    */
  def d07DedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sims = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t.trim.toLowerCase.split(" "))) }
      .toDF("doc_id", "simhash")

    val chunks = sims.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("doc_id", "simhash", "chunk_idx", "chunk_val")

    val cand = chunks.as("a")
      .join(chunks.as("b"), Seq("chunk_idx", "chunk_val"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("a.simhash").as("sim_a"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sim_b"))
      .distinct()

    val dups = cand
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= 6)

    sims
      .join(
        canonicalizeComponents(
          sims.select(col("doc_id").as("id")),
          dups.select(col("doc_a").as("a"), col("doc_b").as("b")))
          .select(col("id").as("doc_id"), col("canonical_id")),
        "doc_id")
      .select("doc_id", "simhash", "canonical_id")
      .orderBy("doc_id")
  }

  /** d10: rolling-hash document fingerprinting (winnowing, MOSS-style).
    * Polynomial Rabin hash over a sliding character window; one
    * fingerprint selected per winnow window (the minimum), giving a
    * position-robust compact sketch. Typed single pass per document —
    * O(chars), no shuffle.
    */
  /** Winnowed rolling-hash fingerprint set of one normalized string:
    * Rabin hashes of every K-gram (hash depends ONLY on the K-char
    * window — position-independent), then the min hash per W-window.
    */
  def rollingFingerprints(text: String, K: Int = 8, W: Int = 4): Array[Long] = {
    val B = 257L
    val Mod = 1000000007L
    val t = text.trim.toLowerCase
    if (t.length < K) Array.empty
    else {
      // After appending char i, evict char i-K weighted by B^K
      // (post-multiply weight), leaving exactly the K-char window hash.
      var powK = 1L
      (1 to K).foreach(_ => powK = powK * B % Mod)
      var h = 0L
      val hashes = new Array[Long](t.length - K + 1)
      var i = 0
      while (i < t.length) {
        h = (h * B + t.charAt(i)) % Mod
        if (i >= K) h = ((h - t.charAt(i - K) * powK) % Mod + Mod) % Mod
        if (i >= K - 1) hashes(i - K + 1) = h
        i += 1
      }
      hashes.sliding(W, 1).map(_.min).toArray.distinct
    }
  }

  def d10RollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .map { case (id, text) =>
        val picks = rollingFingerprints(text)
        if (picks.isEmpty) (id, 0, 0L, 0L)
        else (id, picks.length, picks.min, picks.max)
      }
      .toDF("doc_id", "n_fp", "min_fp", "max_fp")
      .orderBy("doc_id")
  }

  /** d08: exact character-trigram Jaccard over deterministic
    * adjacent-id pairs (the verify primitive of the dedup stack,
    * exercised standalone).
    */
  def d08NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Typed gram extraction for the same reason as [[signatures]]:
    // a Catalyst lambda would re-normalize the text per trigram.
    val docs = Par.fanOut(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .map { case (id, text) =>
        val t = text.trim.toLowerCase
        val g =
          (if (t.length < 3) Array(t)
           else Array.tabulate(t.length - 2)(i => t.substring(i, i + 3))).distinct
        (id, g)
      }
      .toDF("doc_id", "grams")
    val a = docs.select(col("doc_id").as("doc_a"), col("grams").as("g_a"))
    val b = docs.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("grams").as("g_b"))
    a.join(b, "doc_a")
      .select(
        col("doc_a"), col("doc_b"),
        round(TextFunctions.jaccard(col("g_a"), col("g_b")), 4).as("jacc"))
      .orderBy("doc_a")
  }

  // ---------------------------------------------------------------
  // DuckDB oracle twins: replay the exact pipelines above in SQL.
  // ---------------------------------------------------------------

  /** Shared SQL fragment: distinct 3-word shingles of the normalized
    * text (mirrors [[shinglesOf]]).
    */
  private[operators] val shingleSql =
    """CASE WHEN len(string_split(s, ' ')) < 3 THEN [s]
      |     ELSE list_distinct([array_to_string(string_split(s, ' ')[i:i+2], ' ')
      |                         FOR i IN range(1, len(string_split(s, ' ')) - 1)]) END""".stripMargin

  /** Rounds (alternating large-star / small-star steps) of the
    * oracle's unrolled star-contraction. Monotone id chains — exactly
    * what replicated order bursts produce — defeat BOTH plain
    * min-label propagation (one hop per round) and self-pointer
    * jumping (the label chain shifts in lockstep; measured: a
    * 224-node chain at 10× replay still unconverged after 40 ladder
    * rounds). Star steps rewire edges instead of propagating labels:
    * large-star hangs every larger neighbor of v onto min(N⁺(v)),
    * small-star the smaller ones — each LS/SS pair roughly halves
    * component diameter REGARDLESS of id order (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"). Measured on the
    * 10× corpus: converged at 12 steps (ladder needed 64); 24 steps
    * cover the diameters a further 100× replay could produce, and
    * post-convergence steps cost ~nothing (the edge set is empty).
    */
  private val CcRounds = 24

  /** Shared SQL fragment: connected components over
    * `dups(doc_a, doc_b)` + all-`doc_id` `docs`, emitting
    * (doc_id, canonical_id) — the oracle twin of
    * [[canonicalizeComponents]].
    *
    * NOT the recursive-CTE transitive closure: `reach` materializes
    * O(Σ|component|²) pairs, which melts on the replicated
    * mega-components a 10× scale-up produces. Instead an UNROLLED
    * min-label propagation with pointer jumping — each round is one
    * linear join+groupBy (min over self ∪ neighbor labels ∪ the
    * label's own label), total O(rounds × (V+E)) — the same shape the
    * Spark side's distributed fallback runs. A final `error()` fence
    * compares the last two rounds: if labels still moved, the oracle
    * REFUSES loudly instead of returning a silently-unconverged
    * canonicalization.
    */
  private[graft] val ccSql: String = {
    // AS MATERIALIZED is load-bearing: each step references the prior
    // edge set several times, and DuckDB inlines plain CTEs — 24
    // steps would expand to exponentially many base-table scans.
    //
    // Star-step invariants (why the fence proves correctness):
    //  - every emitted edge stays INSIDE its component (m ∈ N⁺(v)), and
    //    both endpoints of a dropped edge remain connected through m —
    //    so edge-set components never split or merge;
    //  - every node with an edge keeps an edge (v—m_v when m_v < v;
    //    when m_v = v every neighbor is larger and hangs onto v), so
    //    nodes never vanish into the coalesce fallback mid-component;
    //  - at the fence, min-of-closed-neighborhood labels agreeing on
    //    every edge means each component IS a star at its min — its
    //    center is the exact canonical id.
    val steps = (0 until CcRounds).map { k =>
      // Even steps: large-star (larger neighbors hang onto the min);
      // odd: small-star. Alternation is what guarantees ~halving.
      val cmp = if (k % 2 == 0) ">" else "<"
      s"""cc_n$k AS MATERIALIZED (
         |  SELECT x AS v, least(x, min(y)) AS m FROM cc_e$k GROUP BY x),
         |cc_e${k + 1} AS MATERIALIZED (
         |  SELECT x, y FROM (
         |    SELECT e.y AS x, n.m AS y FROM cc_e$k e JOIN cc_n$k n ON n.v = e.x
         |    WHERE e.y $cmp e.x
         |    UNION
         |    SELECT n.m AS x, e.y AS y FROM cc_e$k e JOIN cc_n$k n ON n.v = e.x
         |    WHERE e.y $cmp e.x
         |    UNION
         |    SELECT v, m FROM cc_n$k WHERE v <> m
         |    UNION
         |    SELECT m, v FROM cc_n$k WHERE v <> m
         |  ) WHERE x <> y)""".stripMargin
    }.mkString(",\n")
    s"""cc_e0 AS MATERIALIZED (
       |  SELECT doc_a AS x, doc_b AS y FROM dups WHERE doc_a <> doc_b
       |  UNION SELECT doc_b, doc_a FROM dups WHERE doc_a <> doc_b),
       |$steps,
       |cc_fin AS MATERIALIZED (
       |  SELECT x AS v, least(x, min(y)) AS m FROM cc_e$CcRounds GROUP BY x),
       |cc_chg AS (SELECT count(*) AS c FROM cc_e$CcRounds e
       |  JOIN cc_fin a ON a.v = e.x JOIN cc_fin b ON b.v = e.y
       |  WHERE a.m <> b.m),
       |canon AS (
       |  SELECT d.doc_id,
       |    CASE WHEN (SELECT c FROM cc_chg) > 0
       |         THEN CAST(error('cc oracle: star contraction not converged — raise CcRounds') AS BIGINT)
       |         ELSE coalesce(f.m, d.doc_id) END AS canonical_id
       |  FROM docs d LEFT JOIN cc_fin f ON f.v = d.doc_id
       |)""".stripMargin
  }

  /** CTE chain `t → sh → bh → sg → bd → e → cand`: the MinHash-band
    * BLOCKING stage (shingle → base hash → NPerms affine minima →
    * NBands Horner band hashes → band-bucket candidate join), shared by
    * the d06 and d20 oracles. Every constant is inlined from the Scala
    * definitions above.
    */
  private def minhashCandSql: String = {
    val sigExprs = (0 until NPerms).map { p =>
      s"list_min([(${permA(p)} * h + ${permB(p)}) % $M FOR h IN hs])"
    }.mkString("[\n      ", ",\n      ", "\n    ]")
    val bandExprs = (0 until NBands).map { b =>
      val terms = (0 until BandRows).map(r => b * BandRows + r + 1) // 1-based
      terms.foldLeft("CAST(0 AS BIGINT)") { (acc, idx) =>
        s"(($acc * $BandBase + sig[$idx]) % $M)"
      }
    }.mkString("[\n      ", ",\n      ", "\n    ]")
    s"""t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
       |sh AS (SELECT doc_id, $shingleSql AS shingles FROM t),
       |bh AS (SELECT doc_id, shingles,
       |  [list_reduce(list_prepend(CAST(0 AS BIGINT),
       |     [CAST(unicode(g[i:i]) AS BIGINT) FOR i IN range(1, length(g) + 1)]),
       |   (a, c) -> (a * $StrBase + c) % $M) FOR g IN shingles] AS hs
       |  FROM sh),
       |sg AS (SELECT doc_id, shingles, $sigExprs AS sig FROM bh),
       |bd AS (SELECT doc_id, shingles, $bandExprs AS bands FROM sg),
       |e AS (SELECT doc_id, i AS band_idx, bands[i] AS band_hash
       |      FROM bd CROSS JOIN range(1, ${NBands + 1}) r(i)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM e a JOIN e b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |  WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  /** Full DuckDB replay of d06: MinHash-band blocking →
    * exact-Jaccard verify → connected-component canonicalization.
    */
  def d06OracleSql: String =
    s"""WITH RECURSIVE
       |$minhashCandSql,
       |dups AS (
       |  SELECT doc_a, doc_b
       |  FROM cand
       |  JOIN (SELECT doc_id AS doc_a, shingles AS sh_a FROM bd) USING (doc_a)
       |  JOIN (SELECT doc_id AS doc_b, shingles AS sh_b FROM bd) USING (doc_b)
       |  WHERE len(list_intersect(sh_a, sh_b)) * 1.0
       |      / len(list_distinct(list_concat(sh_a, sh_b))) >= 0.5),
       |docs AS (SELECT doc_id FROM t),
       |$ccSql
       |SELECT doc_id, canonical_id FROM canon ORDER BY doc_id""".stripMargin

  /** d20: the COMPOSED fuzzy-dedup pipeline a curation run actually
    * executes, gated end to end: MinHash band blocking (d06's stage) →
    * bounded edit-distance verify on the collided pairs only (d19's
    * primitive: normalized similarity over the 256-char normalized
    * prefix, sim >= 0.6) → connected-component canonicalization.
    *
    * Scale shape: the blocking pass is O(n) + a bucket equi-join, the
    * quadratic DP runs ONLY on bucket-collided candidates (never
    * pairwise over the corpus), and the canonicalizer is the adaptive
    * CC. The verify lens differs from d06's on purpose — edit distance
    * catches in-place edits that shingle Jaccard under-scores, which is
    * why real pipelines layer both.
    */
  def d20FuzzyDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = signatures(spark, dir)
    val bands = sigs
      .select(col("doc_id"), posexplode(col("bands")))
      .toDF("doc_id", "band_idx", "band_hash")
    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val pre = Tables.documents(spark, dir).select(col("doc_id"),
      substring(lower(trim(col("text"))), 1, TextCorpus.EditDistancePrefix).as("s"))
    // Typed pass: one DP evaluation per candidate pair (the Column form
    // would re-run the O(len^2) DP per referencing expression).
    val dups = cand
      .join(pre.select(col("doc_id").as("doc_a"), col("s").as("s_a")), "doc_a")
      .join(pre.select(col("doc_id").as("doc_b"), col("s").as("s_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("s_a"), col("s_b"))
      .as[(Long, Long, String, String)]
      .map { case (da, db, sa, sb) =>
        val d = TextCorpus.levenshteinDist(sa, sb)
        val m = math.max(sa.length, sb.length)
        (da, db, if (m == 0) 1.0 else 1.0 - d.toDouble / m)
      }
      .toDF("a", "b", "sim")
      .filter(col("sim") >= 0.6)

    canonicalizeComponents(
      sigs.select(col("doc_id").as("id")),
      dups.select(col("a"), col("b")))
      .select(col("id").as("doc_id"), col("canonical_id"))
      .orderBy("doc_id")
  }

  /** Full DuckDB replay of d20: shared blocking CTEs + DuckDB's
    * `levenshtein` (the identical textbook recurrence) + shared CC.
    * `1.0 - d * 1.0 / m` is the same IEEE expression the typed map
    * computes, so the 0.6 threshold can't diverge between engines.
    */
  def d20OracleSql: String =
    s"""WITH RECURSIVE
       |$minhashCandSql,
       |pre AS (SELECT doc_id, substr(lower(trim(text)), 1, ${TextCorpus.EditDistancePrefix}) AS s
       |        FROM documents),
       |dups AS (
       |  SELECT doc_a, doc_b
       |  FROM cand
       |  JOIN (SELECT doc_id AS doc_a, s AS s_a FROM pre) USING (doc_a)
       |  JOIN (SELECT doc_id AS doc_b, s AS s_b FROM pre) USING (doc_b)
       |  WHERE CASE WHEN greatest(length(s_a), length(s_b)) = 0 THEN 1.0
       |             ELSE 1.0 - levenshtein(s_a, s_b) * 1.0
       |                  / greatest(length(s_a), length(s_b)) END >= 0.6),
       |docs AS (SELECT doc_id FROM t),
       |$ccSql
       |SELECT doc_id, canonical_id FROM canon ORDER BY doc_id""".stripMargin

  /** Full DuckDB replay of d07: per-word base-31 Horner hash with a
    * splitmix64 finalizer (wrapping 64-bit arithmetic via UHUGEINT mod
    * 2^64), per-bit majority vote, 16-bit chunk candidate buckets,
    * hamming <= 6 verify, connected components.
    */
  def d07OracleSql: String = {
    val p64 = "CAST('18446744073709551616' AS UHUGEINT)"
    val c1 = "CAST('13787848793156543929' AS UHUGEINT)" // 0xbf58476d1ce4e5b9
    val c2 = "CAST('10723151780598845931' AS UHUGEINT)" // 0x94d049bb133111eb
    s"""WITH RECURSIVE
       |t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
       |w0 AS (SELECT doc_id,
       |  [CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      [CAST(unicode(w[i:i]) AS HUGEINT) FOR i IN range(1, length(w) + 1)]),
       |    (a, c) -> (a * 31 + c) % CAST('18446744073709551616' AS HUGEINT)) AS UBIGINT)
       |   FOR w IN string_split(s, ' ')] AS h0 FROM t),
       |w1 AS (SELECT doc_id,
       |  list_transform(h0, h -> xor(h, h >> 30)) AS h1 FROM w0),
       |w2 AS (SELECT doc_id,
       |  list_transform(h1, h -> CAST(CAST(h AS UHUGEINT) * $c1 % $p64 AS UBIGINT)) AS h2 FROM w1),
       |w3 AS (SELECT doc_id,
       |  list_transform(h2, h -> xor(h, h >> 27)) AS h3 FROM w2),
       |w4 AS (SELECT doc_id,
       |  list_transform(h3, h -> CAST(CAST(h AS UHUGEINT) * $c2 % $p64 AS UBIGINT)) AS h4 FROM w3),
       |wh AS (SELECT doc_id,
       |  list_transform(h4, h -> xor(h, h >> 31)) AS hashes FROM w4),
       |sv AS (SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS UBIGINT),
       |    [CASE WHEN list_sum([CASE WHEN CAST((h >> j) & CAST(1 AS UBIGINT) AS BIGINT) = 1
       |                              THEN 1 ELSE -1 END FOR h IN hashes]) > 0
       |          THEN CAST(1 AS UBIGINT) << j ELSE CAST(0 AS UBIGINT) END
       |     FOR j IN range(0, 64)]),
       |    (a, b) -> a + b) AS sim_u
       |  FROM wh),
       |sm AS (SELECT doc_id, sim_u,
       |  CAST(CASE WHEN CAST(sim_u AS HUGEINT) >= CAST('9223372036854775808' AS HUGEINT)
       |            THEN CAST(sim_u AS HUGEINT) - CAST('18446744073709551616' AS HUGEINT)
       |            ELSE CAST(sim_u AS HUGEINT) END AS BIGINT) AS simhash
       |  FROM sv),
       |ch AS (SELECT doc_id, sim_u, simhash, i AS chunk_idx,
       |  CAST((sim_u >> (16 * i)) & CAST(65535 AS UBIGINT) AS BIGINT) AS chunk_val
       |  FROM sm CROSS JOIN range(0, 4) r(i)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.sim_u AS ua, b.doc_id AS doc_b, b.sim_u AS ub
       |  FROM ch a JOIN ch b ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       |  WHERE a.doc_id < b.doc_id),
       |dups AS (
       |  SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(ua, ub)) <= 6),
       |docs AS (SELECT doc_id FROM t),
       |$ccSql
       |SELECT c.doc_id, s.simhash, c.canonical_id
       |FROM canon c JOIN sm s USING (doc_id)
       |ORDER BY c.doc_id""".stripMargin
  }

  /** d28: INCREMENTAL dedup of a lake CDC feed against table history —
    * the end-to-end composition the incremental-pipeline story exists
    * for: new documents arrive as an append commit, `changesSince`
    * hands downstream ONLY those rows (one file-set scan, no table
    * re-scan), and the winnowed-fingerprint check (d17's machinery)
    * flags which of them duplicate the HISTORICAL snapshot. History
    * fingerprints come from the time-travel v0 read, so the check is
    * stable even while new commits land.
    */
  def d28CdcDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.GraftLake
    val path = graft.SparkEntry.scratch("graft_lake_docs", dir)
    graft.SparkEntry.rmrf(path)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    GraftLake.create(docs.filter(col("doc_id") < 250), path)
    GraftLake.append(docs.filter(col("doc_id") >= 250), path)
    def fps(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          rollingFingerprints(text).map(fp => (id, fp))
        }
        .toDF("doc_id", "fp")
    val histFps = fps(GraftLake.readAt(spark, path, 0))
      .select(col("fp")).distinct()
    val feed = GraftLake.changesSince(spark, path, 0)
    val hits = fps(feed)
      .join(broadcast(histFps), "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_shared_fp"))
    feed.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_fp"), lit(0)).as("n_shared_fp"),
        (coalesce(col("n_shared_fp"), lit(0)) > 0).as("dup_against_history"))
      .orderBy(col("doc_id"))
  }
}
