package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkSpec {

  test("simhash64 is deterministic and near-dup-sensitive") {
    val a = "the quick brown fox jumps over the lazy dog again and again today".split(" ")
    val b = "the quick brown fox jumps over the lazy cat again and again today".split(" ")
    val c = "completely different words entirely unrelated content here now folks".split(" ")
    val ha = Dedup.simhash64(a)
    assert(ha == Dedup.simhash64(a)) // deterministic
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(ha, Dedup.simhash64(b)) < hamming(ha, Dedup.simhash64(c)))
  }

  test("minhash signature agreement tracks true Jaccard similarity") {
    import spark.implicits._
    // Pairs with known shingle overlap: signature agreement rate
    // (fraction of equal permutation minima) must order the pairs the
    // same way true Jaccard does, and sit near it.
    val words = ('a' to 'z').map(_.toString * 3)
    def doc(idxs: Seq[Int]): String = idxs.map(words).mkString(" ")
    val d0 = doc(0 until 20)
    val high = doc((0 until 18) ++ Seq(24, 25)) // ~80% token overlap
    val low = doc((0 until 6) ++ (14 until 26)) // ~30% overlap
    val dir = java.nio.file.Files.createTempDirectory("graft-mh").toString
    Seq((0L, d0, "en", "s", 0L), (1L, high, "en", "s", 0L), (2L, low, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    def trueJaccard(a: String, b: String): Double = {
      def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val (x, y) = (sh(a), sh(b))
      (x & y).size.toDouble / (x | y).size
    }
    // Signature agreement via the public operator's verify threshold:
    // high-overlap pair must collapse (jaccard >= 0.5), low must not.
    val mh = Dedup.d06DedupMinhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(trueJaccard(d0, high) > 0.5 && mh(1L) == 0L, s"high-overlap pair not collapsed: $mh")
    assert(trueJaccard(d0, low) < 0.5 && mh(2L) == 2L, s"low-overlap pair wrongly collapsed: $mh")
  }

  test("d06 minhash dedup: every doc mapped, canonical <= doc_id") {
    val rows = Dedup.d06DedupMinhash(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach(r =>
      assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("doc_id")))
  }

  test("d07 simhash dedup: identical texts collapse to one canonical") {
    import spark.implicits._
    // Property check on the primitive instead of the table (testdata has
    // no exact dups): identical token streams hash identically.
    val t = "spark group query row data slow small filter".split(" ")
    assert(Dedup.simhash64(t) == Dedup.simhash64(t.toVector))
    val rows = Dedup.d07DedupSimhash(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
  }

  test("d10 rolling-hash fingerprints are position-independent (shared content overlaps)") {
    // The same long core embedded at different offsets must yield
    // heavily overlapping winnow fingerprints — the property a
    // prefix-dependent (broken) rolling hash cannot satisfy.
    val core = "the quick brown fox jumps over the lazy dog near the river bank"
    val a = Dedup.rollingFingerprints("xx " + core).toSet
    val b = Dedup.rollingFingerprints("yyyyy " + core).toSet
    val overlap = (a & b).size.toDouble / math.min(a.size, b.size)
    assert(overlap > 0.7, s"expected shared-core overlap, got $overlap")
    // And disjoint content barely collides.
    val c = Dedup.rollingFingerprints("entirely different words with no common substring at all").toSet
    assert((a & c).isEmpty)
    // Operator-level: one row per document.
    assert(Dedup.d10RollingFingerprint(spark, sf).count() ==
      Tables.documents(spark, sf).count())
  }

  test("d06/d07 collapse planted near-duplicates to the smallest id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, base + " rho", "en", "s1", 0L), // one appended word
      (2L, "totally different content words here entirely unrelated material", "en", "s2", 0L),
      (3L, base.replace(" pi", " pi sigma tau"), "en", "s3", 0L), // suffix edit
      (4L, "another standalone document about nothing shared with others", "en", "s4", 0L),
      // word reorder: identical word multiset -> identical simhash
      // (hamming 0) regardless of the hash family draw
      (5L, base.replace("delta epsilon", "epsilon delta"), "en", "s5", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val mh = Dedup.d06DedupMinhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(mh(1L) == 0L && mh(3L) == 0L, s"minhash missed planted dups: $mh")
    assert(mh(2L) == 2L && mh(4L) == 4L, s"minhash false positive: $mh")

    val sh = Dedup.d07DedupSimhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(sh(5L) == 0L, s"simhash missed reordered dup: $sh")
    assert(sh(2L) == 2L && sh(4L) == 4L, s"simhash false positive: $sh")
  }

  test("d07 collapses a fuzzy near-dup (hamming in 1..6), not only identical hashes") {
    import spark.implicits._
    // One replaced word in a 40-word doc: hamming must land strictly
    // inside the verify tolerance, so this covers the fuzzy range a
    // word-reorder (hamming 0) cannot.
    val base = (0 until 40).map(i => s"tok$i")
    val edited = base.updated(10, "changedword0")
    val h = java.lang.Long.bitCount(
      Dedup.simhash64(base) ^ Dedup.simhash64(edited))
    assert(h >= 1 && h <= 6, s"re-pick the edit for this hash family: hamming $h")

    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    Seq(
      (0L, base.mkString(" "), "en", "s", 0L),
      (1L, edited.mkString(" "), "en", "s", 0L),
      (2L, "wholly unrelated content with none of those tokens present", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val sh = Dedup.d07DedupSimhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(sh == Map(0L -> 0L, 1L -> 0L, 2L -> 2L), s"fuzzy pair not collapsed: $sh (hamming $h)")
  }

  test("near-dup chains collapse transitively to one canonical id (A~B~C)") {
    import spark.implicits._
    // A~B and B~C are near-dups (jaccard >= 0.5) but A~C is NOT —
    // a single min-partner pass would leave C pointing at B; connected
    // components must pull the whole chain to A's id.
    val a = (0 until 50).map(i => s"alpha$i")
    val tail = (42 until 50).map(i => s"beta$i")
    val docA = a.mkString(" ")
    val docB = (a.take(42) ++ tail).mkString(" ")
    val docC = ((0 until 9).map(i => s"gamma$i") ++ a.slice(9, 42) ++ tail).mkString(" ")

    def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def jacc(x: String, y: String) =
      (sh(x) & sh(y)).size.toDouble / (sh(x) | sh(y)).size
    assert(jacc(docA, docB) >= 0.5 && jacc(docB, docC) >= 0.5 && jacc(docA, docC) < 0.5,
      s"test corpus broken: ${jacc(docA, docB)} ${jacc(docB, docC)} ${jacc(docA, docC)}")

    val dir = java.nio.file.Files.createTempDirectory("graft-chain").toString
    Seq((0L, docA, "en", "s", 0L), (1L, docB, "en", "s", 0L), (2L, docC, "en", "s", 0L),
      (3L, "unrelated filler content entirely different from the rest", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val mh = Dedup.d06DedupMinhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(mh == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L),
      s"chain did not collapse to one component: $mh")
  }

  test("d20 composed fuzzy dedup: blocked, edit-verified, transitively canonicalized") {
    import spark.implicits._
    // A/B/C are a fuzzy chain (small in-place edits keep both shingle
    // overlap for BLOCKING and prefix edit-sim >= 0.6 for VERIFY); D
    // shares enough shingles to collide in a band but diverges too much
    // in edit distance — the verify stage must reject it.
    val words = (0 until 40).map(i => s"alpha$i")
    val docA = words.mkString(" ")
    val docB = words.updated(5, "beta5").mkString(" ")
    val docC = words.updated(5, "beta5").updated(11, "gamma11").mkString(" ")
    val docD = (words.take(20) ++ (0 until 20).map(i => s"zzzzz$i omega$i")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-d20").toString
    Seq((0L, docA, "en", "s", 0L), (1L, docB, "en", "s", 0L),
      (2L, docC, "en", "s", 0L), (3L, docD, "en", "s", 0L),
      (4L, "entirely different content unrelated to everything else here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = Dedup.d20FuzzyDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L),
      s"composed pipeline wrong: $got")
  }

  test("d08 jaccard is within [0,1] and defined for all adjacent pairs") {
    val rows = Dedup.d08NgramJaccard(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count() - 1)
    rows.foreach { r =>
      val j = r.getAs[Double]("jacc")
      assert(j >= 0.0 && j <= 1.0)
    }
  }
}
