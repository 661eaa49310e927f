package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextCorpus

/** Independent brute-force references for the corpus-statistics
  * operators, computed driver-side from the collected sf0.001 corpus
  * (100 docs) — a genuinely separate code path from the distributed
  * plans under test.
  */
class TextCorpusSpec extends AnyFunSuite with SparkSpec {

  test("d32 containment equals a brute pairwise replay of the rare-shingle rule") {
    import graft.operators.{Dedup, TextCorpus}
    val got = TextCorpus.d32Containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Dedup.shinglesOf(r.getString(1)).toSet))
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val rare = df.filter(_._2 <= 10).keySet
    val tests = docs.filter(_._1 % 10 == 7)
    val trains = docs.filter(_._1 % 10 != 7)
    val expect = (for {
      (tid, ts) <- tests
      (rid, rs) <- trains
      if (ts & rs & rare).size >= 3
      if (ts & rs).size.toDouble / ts.size >= 0.5
    } yield (rid, tid)).toSet
    assert(got == expect && got.nonEmpty)
  }

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("d13 paragraph dedup matches a brute-force cross-doc sentence count") {
    val perDoc: Map[Long, Set[String]] = docs.map { case (id, text) =>
      id -> text.split("\\. ").map(_.trim.toLowerCase)
        .filter(_.nonEmpty).toSet
    }.toMap
    val docsWith: Map[String, Int] = perDoc.toSeq
      .flatMap { case (id, ss) => ss.map(s => (s, id)) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }

    val expected = perDoc.toSeq.sortBy(_._1).map { case (id, ss) =>
      val shared = ss.count(s => docsWith(s) >= 2)
      (id, ss.size, shared)
    }
    val got = TextCorpus.d13ParagraphDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == expected)
  }

  test("d14 repetition matches brute-force word frequencies") {
    val expected = docs.sortBy(_._1).map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val freq = ws.groupBy(identity).map(_._2.length)
      (id, ws.length, freq.size, freq.max)
    }
    val got = TextCorpus.d14Repetition(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == expected)
  }

  test("d15 tf-idf top terms match a brute-force ranking") {
    val tf: Seq[(Long, String, Long)] = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, xs) => (id, w, xs.length.toLong) }
    }
    val dfm: Map[String, Long] = tf.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val n = docs.size.toLong
    val expected = tf.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (id, ws) =>
      ws.map { case (_, w, f) => (w, f.toDouble * n / dfm(w)) }
        .sortBy { case (w, s) => (-s, w) }
        .take(3).zipWithIndex
        .map { case ((w, s), i) => (id, i + 1, w, math.round(s * 1e4)) }
    }
    val got = TextCorpus.d15Tfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        math.round(r.getDouble(3) * 1e4))).toSeq
    assert(got == expected)
  }

  test("d16 bigram counts match a brute-force count") {
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.length >= 2) ws.sliding(2).foreach(p => counts(p(0) + " " + p(1)) += 1)
    }
    val expected = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }.take(20)
    val got = TextCorpus.d16NgramStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("d17 contamination finds a planted benchmark copy and nothing else spurious") {
    val out = TextCorpus.d17Contamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    // Output covers exactly the corpus side (doc_id >= 50), flags are
    // consistent with counts.
    assert(out.forall(_._1 >= 50))
    assert(out.forall { case (_, n, c) => c == (n > 0) })
    // Brute-force reference: winnowed-fingerprint overlap per doc.
    val fps = docs.map { case (id, t) =>
      id -> graft.operators.Dedup.rollingFingerprints(t).toSet
    }.toMap
    val bench = fps.filter(_._1 < 50).values.flatten.toSet
    val expected = docs.map(_._1).filter(_ >= 50).sorted.map { id =>
      val shared = (fps(id) & bench).size
      (id, shared, shared > 0)
    }
    assert(out.sortBy(_._1).toSeq == expected)
  }

  test("d18 split is stable: removing documents never moves the others") {
    val full = TextCorpus.d18StableSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    // Buckets roughly follow 80/10/10 (hash uniformity, loose bounds).
    val n = full.size.toDouble
    val train = full.values.count(_ == "train") / n
    assert(train > 0.6 && train < 0.95, s"train fraction $train implausible")

    // Re-split a half-corpus written elsewhere: every retained doc must
    // keep its split — the property that makes the split usable across
    // corpus versions.
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      .write.parquet(s"$dir/documents.parquet")
    val half = TextCorpus.d18StableSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(half.nonEmpty)
    half.foreach { case (id, split) => assert(full(id) == split, s"doc $id moved") }
  }

  test("d47 global shuffle: reproducible order, balanced shards, permutation of the corpus") {
    val out1 = TextCorpus.d47GlobalShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val out2 = TextCorpus.d47GlobalShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // bit-for-bit reproducible: the order is a pure function of
    // content + seed, independent of any physical partitioning
    assert(out1.toSeq == out2.toSeq)
    val n = out1.length
    // a PERMUTATION: every doc exactly once, positions 1..n
    assert(out1.map(_._1).toSet.size == n)
    assert(out1.map(_._3).toSeq == (1L to n.toLong))
    // shard balance: standard NTILE — sizes differ by at most one,
    // first (n mod shards) shards carry the extra row
    val sizes = out1.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == (1 to TextCorpus.ShuffleShards).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    val q = n / TextCorpus.ShuffleShards
    val r = n % TextCorpus.ShuffleShards
    (1 to TextCorpus.ShuffleShards).foreach { sh =>
      assert(sizes(sh) == (if (sh <= r) q + 1 else q), s"shard $sh")
    }
    // shard assignment is monotone in position (contiguous ranges)
    out1.sortBy(_._3).map(_._4).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1))
    }
    // the order actually shuffles: not the doc_id order
    assert(out1.map(_._1).toSeq != out1.map(_._1).sorted.toSeq)
    // driver replay: key = (polyHash(lower(trim(text))) * 1000003 +
    // seed) mod p, order = (key, doc_id)
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val ph = graft.operators.Dedup.polyHash(text.trim.toLowerCase)
      (id, (ph * 1000003L + TextCorpus.ShuffleSeed) % 1000000007L)
    }.sortBy { case (id, k) => (k, id) }
    assert(out1.map(t => (t._1, t._2)).toSeq == expect.toSeq)
  }

  test("d19 edit distance matches a brute-force Levenshtein DP") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val norm = docs
      .map { case (id, t) => (id, t.trim.toLowerCase.take(TextCorpus.EditDistancePrefix)) }
      .sortBy(_._1)
    val expected = norm.zip(norm.tail).map { case ((ia, sa), (ib, sb)) =>
      (ia, ib, lev(sa, sb))
    }
    val got = TextCorpus.d19EditDistance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected)
  }

  test("d17 pushes the doc_id split filters into the parquet scans") {
    // The bench/corpus split must reach the scans (a shared opaque
    // flatMap would block it and fingerprint the whole corpus twice).
    val plan = TextCorpus.d17Contamination(spark, sf).queryExecution.executedPlan
    val scans = plan.collectLeaves().map(_.toString)
      .filter(_.contains("documents.parquet"))
    assert(scans.exists(s =>
      s.contains("PushedFilters") && s.contains("LessThan(doc_id,50)")),
      s"bench-side doc_id filter not pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(s =>
      s.contains("PushedFilters") && s.contains("GreaterThanOrEqual(doc_id,50)")),
      s"corpus-side doc_id filter not pushed:\n${scans.mkString("\n")}")
  }

  test("d13 flags a planted boilerplate sentence across documents") {
    import org.apache.spark.sql.functions._
    // Two docs share the exact boilerplate sentence; the third is clean.
    val planted = Seq(
      (1L, "subscribe to our newsletter. unique alpha content here."),
      (2L, "subscribe to our newsletter. totally different beta text."),
      (3L, "nothing shared with anyone. standalone gamma writing."))
    import spark.implicits._
    val df = planted.toDF("doc_id", "text")
    // Reuse the operator's pipeline via a temp view + same expressions:
    val sents = df
      .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("s"))
      .filter(length(trim(col("s"))) > 0)
      .select(col("doc_id"), md5(lower(trim(col("s")))).as("h")).distinct()
    val freq = sents.groupBy("h").agg(countDistinct("doc_id").as("nd"))
    val shared = sents.join(freq, "h").filter(col("nd") >= 2)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(shared == Seq(1L, 2L))
  }

  test("d21 dup-ngram profile matches a brute-force replay and has no shuffle") {
    val df = TextCorpus.d21DupNgrams(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty).toSeq
      Seq(2, 3, 5).foreach { n =>
        val grams = ws.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        assert(got((id, n)) == ((grams.length, grams.distinct.length)),
          s"doc $id n=$n")
      }
    }
    // Per-doc-local property => the plan must contain NO exchange
    // before the presentation sort (count the AQE final plan only —
    // toString also prints the pre-AQE initial plan).
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalPlan).length
    assert(exchanges <= 1, s"expected only the orderBy range exchange:\n$plan")
  }

  test("d22 stratified sample is content-stable and respects quotas") {
    val rows = TextCorpus.d22StratifiedSample(spark, sf).collect()
    // Deterministic: a doc's membership depends only on (text, lang).
    val again = TextCorpus.d22StratifiedSample(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    rows.foreach { r =>
      val quota = TextCorpus.SampleQuotaPerMille(r.getAs[String]("lang"))
      assert(r.getAs[Boolean]("kept") == (r.getAs[Int]("mille") < quota))
    }
    // The resample pulls en's share down (quota 250 vs 600 elsewhere).
    val kept = rows.filter(_.getAs[Boolean]("kept"))
    val enShareBefore = rows.count(_.getAs[String]("lang") == "en").toDouble / rows.length
    val enShareAfter = kept.count(_.getAs[String]("lang") == "en").toDouble / kept.length
    assert(enShareAfter < enShareBefore)
  }

  test("d23 quality filter matches a brute-force rule evaluation and discriminates") {
    val stops = TextCorpus.FilterStopwords.toSet
    val expected = docs.sortBy(_._1).map { case (id, text) =>
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
      (id, n, reasons.isEmpty, reasons.mkString(";"))
    }
    val got = TextCorpus.d23QualityFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(5), r.getString(6))).toSeq
    assert(got == expected)
    // A gate that never drops (or never keeps) anything proves nothing.
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d24 block dedup keeps first occurrences and rebuilds survivors exactly") {
    val blocks = docs.sortBy(_._1).flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty)
        .grouped(TextCorpus.DedupBlockWords).zipWithIndex
        .map { case (b, i) => (id, i, b.mkString(" ")) }
    }
    val firstOf = blocks.groupBy(_._3)
      .map { case (s, xs) => s -> xs.minBy(x => (x._1, x._2)) }
    val expected = blocks.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, bs) =>
      val keptBlocks = bs.filter(b => firstOf(b._3) == b).sortBy(_._2)
      (id, bs.size, keptBlocks.size, md5hex(keptBlocks.map(_._3).mkString(" ")))
    }
    val got = TextCorpus.d24BlockDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == expected)
    // The corpus must actually contain cross-doc duplicate blocks for
    // this spec to exercise the election.
    assert(got.exists { case (_, nb, nk, _) => nk < nb })
  }

  test("d26 Gini diversity matches a brute-force frequency computation") {
    val expected = docs.sortBy(_._1).map { case (id, text) =>
      val chars = text.filterNot(_ == ' ')
      val charSq = chars.groupBy(identity).values.map(g => g.length.toLong * g.length).sum
      val ws = text.split(" ").filter(_.nonEmpty)
      val wordSq = ws.groupBy(identity).values.map(g => g.length.toLong * g.length).sum
      def ppm(num: Long, den: Long): Long =
        if (den == 0) 0L else (num * 2000000L + den) / (2L * den)
      val nc = chars.length.toLong
      val nw = ws.length.toLong
      (id, nc, nw, ppm(nc * nc - charSq, nc * nc), ppm(nw * nw - wordSq, nw * nw))
    }
    val got = TextCorpus.d26CharDiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // Diversity must vary across the corpus (a constant score proves nothing).
    assert(got.map(_._5).distinct.size > 1)
  }

  test("d36 LM perplexity matches a brute per-doc bigram scoring and decile flag") {
    def words(t: String): Array[String] = t.split(" ").filter(_.nonEmpty)
    def bigrams(t: String): Seq[(String, String)] =
      words(t).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
    def bitlen(x: Long): Int = java.lang.Long.toBinaryString(x).length
    val clean = docs.filter(_._1 % 10 == 0)
    val bigCnt = clean.flatMap(d => bigrams(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctxCnt = clean.flatMap(d => bigrams(d._2).map(_._1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = clean.flatMap(d => words(d._2)).distinct.size.toLong
    val perDoc = docs.filter(_._1 % 10 != 0)
      .map { case (id, t) => (id, bigrams(t)) }
      .filter(_._2.nonEmpty)
      .map { case (id, bs) =>
        val bits = bs.map { b =>
          (bitlen(ctxCnt.getOrElse(b._1, 0L) + v) -
            bitlen(bigCnt.getOrElse(b, 0L) + 1L)).toLong
        }.sum
        (id, bs.size.toLong, bits, bits * 1000L / bs.size)
      }
    val k = perDoc.size / 10
    val flagged = perDoc.sortBy(d => (-d._4, d._1)).take(k).map(_._1).toSet
    val expected = perDoc.sortBy(_._1)
      .map(d => (d._1, d._2, d._3, d._4, flagged(d._1)))
    val got = TextCorpus.d36LmPerplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
    // The flag discriminates: some docs flagged, most not.
    assert(k > 0 && got.count(_._5) == k && got.exists(!_._5))
  }

  test("d25 packing spans match a sequential prefix sum") {
    val toks = docs.sortBy(_._1)
      .map { case (id, t) => (id, t.split(" ").count(_.nonEmpty).toLong) }
    var cum = 0L
    val expected = toks.map { case (id, n) =>
      val start = cum / TextCorpus.PackCapacity
      val end = if (n > 0) (cum + n - 1) / TextCorpus.PackCapacity else start
      val res = (id, n, cum, start, end, if (n > 0) end - start + 1 else 0L)
      cum += n
      res
    }
    val got = TextCorpus.d25PackChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // Packing must produce multi-chunk spans somewhere (docs longer
    // than the capacity boundary) or the span math is untested.
    assert(got.exists(_._6 >= 2))
  }

  test("d27 chunk profile equals a per-doc brute chunking replay") {
    val got = graft.operators.TextCorpus.d27ChunkOverlap(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length // trailing empties kept, = string_split
      val starts = 0 until n by graft.operators.TextCorpus.ChunkStride
      val lens = starts.map(s0 => math.min(graft.operators.TextCorpus.ChunkCap, n - s0))
      id -> (n, starts.size, lens.map(_.toLong).sum, lens.map(_.toLong).sum - n)
    }.toMap
    assert(got == want)
  }

  test("d37 removes corpus-duplicate sentences, keeping first occurrence") {
    import graft.operators.TextCorpus
    val got = TextCorpus.d37SentenceDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap

    // Brute replay: explode, hash, global first-occurrence keep.
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1) + ". all rights reserved boilerplate notice"))
    case class S(doc: Long, pos: Int, s: String)
    val sents = docs.flatMap { case (d, t) =>
      t.split("\\. ").zipWithIndex
        .map { case (x, i) => S(d, i + 1, x) }
        .filter(_.s.trim.nonEmpty)
    }
    def h(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.trim.toLowerCase.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val firstKv = sents.groupBy(x => h(x.s))
      .view.mapValues(_.map(x => x.doc * 100000L + x.pos).min).toMap
    val byDoc = sents.groupBy(_.doc)
    byDoc.foreach { case (d, ss) =>
      val kept = ss.filter(x => firstKv(h(x.s)) == x.doc * 100000L + x.pos)
      val cleaned = kept.sortBy(_.pos).map(_.s).mkString(". ")
      val (nS, nK, md) = got(d)
      assert(nS == ss.length && nK == kept.length, s"doc $d counts")
      assert(md == h2(cleaned), s"doc $d cleaned text")
    }
    // sanity: something was actually removed at this SF
    assert(got.values.exists { case (a, b, _) => b < a })
    def h2(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("d38 removes covered duplicate-span tokens, keeping first occurrence") {
    import graft.operators.TextCorpus
    val got = TextCorpus.d38SubstringDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap

    val L = 8
    val boiler = " shared footer alpha beta gamma delta epsilon zeta " +
      "eta theta iota kappa"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), (r.getString(1) + boiler).split(" ")))
    def md(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // global first-occurrence per L-gram
    val firstKv = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (d, ws) =>
      (1 to math.max(ws.length - L + 1, 0)).foreach { pos =>
        val g = ws.slice(pos - 1, pos - 1 + L).mkString(" ")
        val kv = d * 100000L + pos
        firstKv.updateWith(g)(o => Some(o.fold(kv)(math.min(_, kv))))
      }
    }
    docs.foreach { case (d, ws) =>
      val covered = scala.collection.mutable.Set[Int]()
      (1 to math.max(ws.length - L + 1, 0)).foreach { pos =>
        val g = ws.slice(pos - 1, pos - 1 + L).mkString(" ")
        if (firstKv(g) != d * 100000L + pos)
          (pos until pos + L).foreach(covered += _)
      }
      val kept = (1 to ws.length).filterNot(covered).map(p => ws(p - 1))
      val (nT, nR, h) = got(d)
      assert(nT == ws.length && nR == covered.size, s"doc $d counts")
      assert(h == md(kept.mkString(" ")), s"doc $d cleaned text")
    }
    assert(got.values.exists(_._2 > L)) // overlap-merged removals happened
  }

  test("d44: temperature weights are exact repeated isqrts; rates replay in plain Scala") {
    val sf = "/root/testdata/sf0.001"
    import graft.operators.{Dedup, TextCorpus}
    // brute replay: counts, isqrt weights, integer rates, hash gate
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getString(2), Dedup.polyHash(
        r.getString(1).trim.toLowerCase) % 10000L))
    def isqrt(n: Long) = math.floor(math.sqrt(n.toDouble)).toLong
    val bysrc = rows.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val nTotal = rows.length.toLong
    val wTotal = bysrc.values.map(h => isqrt(h.length.toLong)).sum
    val expect = bysrc.toSeq.sortBy(_._1).map { case (s, hs) =>
      val n = hs.length.toLong
      val w = isqrt(n)
      val bp = math.min(10000L, (w * (nTotal / 2) * 10000L) / (wTotal * n))
      (s, n, w, bp, hs.count(_ < bp).toLong)
    }
    val got = TextCorpus.d44TemperatureSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // T=2 flattens: on a skewed corpus the rare source keeps a
    // strictly higher rate than the common one (sf0.001's sources
    // are uniform, so the property needs a synthetic skew)
    locally {
      import spark.implicits._
      val skew = ((1 to 900).map(i => (i.toLong, s"text $i", "big")) ++
        (1 to 100).map(i => (1000L + i, s"rare $i", "small")))
        .toDF("doc_id", "text", "source")
      val r = TextCorpus.temperatureSample(skew, temperature = 2).collect()
        .map(x => x.getString(0) -> x.getLong(3)).toMap
      assert(r("small") > r("big"))
    }
    // T=1 degenerates to a uniform keep-rate (w = n cancels)
    val t1 = TextCorpus.temperatureSample(
      Tables.documents(spark, sf), temperature = 1).collect()
    assert(t1.map(_.getLong(3)).distinct.length == 1)
    // T=4 double-isqrt weight
    val t4 = TextCorpus.temperatureSample(
      Tables.documents(spark, sf), temperature = 4).collect()
    t4.foreach(r => assert(r.getLong(2) == isqrt(isqrt(r.getLong(1)))))
    // unsupported temperatures refuse loudly
    val e = intercept[IllegalArgumentException](TextCorpus.temperatureSample(
      Tables.documents(spark, sf), temperature = 3))
    assert(e.getMessage.contains("T in {1, 2, 4}"))
  }

  test("d46 sequence packing equals a driver-side brute replay") {
    val dir = "/root/testdata/sf0.001"
    // plain-Scala replay: stream-order exclusive cumsum, chunk math
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val w = TextCorpus.PackWindow
    var cum = 0L
    val expect = scala.collection.mutable.LinkedHashMap[Long, (Long, Long, Long)]()
    docs.foreach { case (_, text) =>
      val toks = text.split(" ", -1).length.toLong
      val bin = cum / w
      val endBin = (cum + toks - 1) / w
      val (d, t, st) = expect.getOrElse(bin, (0L, 0L, 0L))
      expect(bin) = (d + 1, t + toks, st + (if (endBin > bin) 1L else 0L))
      cum += toks
    }
    val got = TextCorpus.d46SequencePack(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect.toMap)
    // every token is packed exactly once: window masses total the stream
    assert(got.values.map(_._2).sum == cum)
    // interior windows each START at a multiple of w (full coverage):
    // each bin's doc count is positive and bins are contiguous 0..max
    val bins = got.keySet
    assert(bins == (0L to bins.max).toSet)
  }
}
