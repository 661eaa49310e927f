package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Near-duplicate detection (SURVEY.md §2: d06..d08).
  *
  * Scale design: both MinHash-LSH and SimHash are strictly
  * O(n) signature passes + an equi-join on bucket keys — never an
  * O(n^2) pairwise compare. The expensive verify (exact Jaccard /
  * hamming) runs only on bucket-collided candidate pairs. Candidate
  * pairs carry only ids through the shuffle; payloads are re-joined
  * afterwards.
  */
object Dedup {

  /** JVM-stable seeded 64-bit string hash — the MinHash "permutation"
    * family (one seed pair per permutation index).
    */
  private def saltedHash64(seed: Int, s: String): Long = {
    val h1 = MurmurHash3.stringHash(s, seed * 0x9e3779b9 + 1)
    val h2 = MurmurHash3.stringHash(s, seed * 0x85ebca6b + 7)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** One-pass MinHash signature computation per document: distinct
    * 3-word shingles → 32 permutation minima → 8 bands of 4.
    *
    * Deliberately a typed `map`, not nested Catalyst lambdas: Catalyst
    * inlines aliased expressions into higher-order-function bodies
    * (CollapseProject has no CSE there), which re-evaluates the
    * tokenizer per shingle x per permutation x per band — a
    * combinatorial blowup. One JVM pass is O(shingles x 32) and
    * shuffles nothing.
    */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.trim.toLowerCase.split(" ")
        val sh =
          (if (toks.length < 3) Array(toks.mkString(" "))
           else toks.sliding(3).map(_.mkString(" ")).toArray).distinct
        val sig = Array.tabulate(32)(s => sh.iterator.map(x => saltedHash64(s, x)).min)
        val bands = Array.tabulate(8)(b =>
          MurmurHash3.arrayHash(sig.slice(b * 4, b * 4 + 4), 0x12345671).toLong)
        (id, sh, bands)
      }
      .toDF("doc_id", "shingles", "bands")
  }

  /** d06: MinHash + LSH near-dup dedup.
    * Output: every doc with its canonical (smallest matched) id —
    * docs with no near-dup map to themselves.
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

    // Single-pass canonicalization: min matched partner (not full
    // connected components; transitive chains resolve over reruns).
    val canon = dups
      .select(col("doc_b").as("doc_id"), col("doc_a").as("partner"))
      .groupBy("doc_id").agg(min("partner").as("canonical_id"))
    sigs.select("doc_id")
      .join(canon, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("doc_id")))
      .orderBy("doc_id")
  }

  /** JVM-stable 64-bit word hash (MurmurHash3 x2, fixed seeds). */
  private def wordHash64(w: String): Long = {
    val h1 = MurmurHash3.stringHash(w, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(w, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
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
    * to the smallest matched id.
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

    val canon = dups
      .select(col("doc_b").as("doc_id"), col("doc_a").as("partner"))
      .groupBy("doc_id").agg(min("partner").as("canonical_id"))
    sims
      .join(canon, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("doc_id")))
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
    val M = 1000000007L
    val t = text.trim.toLowerCase
    if (t.length < K) Array.empty
    else {
      // After appending char i, evict char i-K weighted by B^K
      // (post-multiply weight), leaving exactly the K-char window hash.
      var powK = 1L
      (1 to K).foreach(_ => powK = powK * B % M)
      var h = 0L
      val hashes = new Array[Long](t.length - K + 1)
      var i = 0
      while (i < t.length) {
        h = (h * B + t.charAt(i)) % M
        if (i >= K) h = ((h - t.charAt(i - K) * powK) % M + M) % M
        if (i >= K - 1) hashes(i - K + 1) = h
        i += 1
      }
      hashes.sliding(W, 1).map(_.min).toArray.distinct
    }
  }

  def d10RollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
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
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
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
}
