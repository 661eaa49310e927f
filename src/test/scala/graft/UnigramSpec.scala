package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram-LM trainer: the Viterbi segmenter's exact semantics
  * (coverage, fewest-pieces dominance, path tie-break) and a full
  * driver-side brute replay of the two-round EM pipeline at
  * sf0.001, pinning the distributed fold to plain Scala.
  */
class UnigramSpec extends AnyFunSuite with SparkSpec {

  test("segment: single-char coverage always feasible; fewest pieces dominate") {
    val scores = Map("a" -> 3L, "b" -> 3L, "ab" -> 5L, "abab" -> 9L)
    // 4-char piece (1 step) beats 2x "ab" (2 steps) whatever the bits
    assert(Unigram.segment("abab", scores) == Seq("abab"))
    // "abab"+"x" (2 steps) beats "ab"+"ab"+"x" (3 steps) and chars
    assert(Unigram.segment("ababx", scores ++ Map("x" -> 1L)) ==
      Seq("abab", "x"))
    // without the 4-char piece, "ab"+"ab"+"x" wins over chars
    assert(Unigram.segment("ababx",
      Map("ab" -> 5L, "a" -> 3L, "b" -> 3L, "x" -> 1L)) ==
      Seq("ab", "ab", "x"))
    // unseen substrings fall back to chars
    assert(Unigram.segment("ba", scores) == Seq("b", "a"))
  }

  test("segment: equal scores break on the lexicographically smallest path") {
    // "ab"+"cd" vs "abc"+"d" — craft equal piece counts and equal
    // total bits: both 2 pieces, both sum 4 bits
    val scores = Map("ab" -> 2L, "cd" -> 2L, "abc" -> 2L, "d" -> 2L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L)
    // paths: ",ab,cd" vs ",abc,d" — ",ab,cd" < ",abc,d" (',' < 'c')
    assert(Unigram.segment("abcd", scores) == Seq("ab", "cd"))
  }

  test("d42 equals a driver-side brute replay of the two-round EM") {
    val dir = "/root/testdata/sf0.001"
    // plain-Scala replay over the collected corpus
    val texts = Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val words = scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_.toLowerCase.split("[^a-z0-9]+").foreach { w =>
      if (w.nonEmpty && w.length <= Unigram.MaxWordLen)
        words(w) = words.getOrElse(w, 0L) + 1L
    })
    val cands = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, n) =>
      for {
        i <- 0 until w.length
        k <- 1 to math.min(Unigram.MaxPieceLen, w.length - i)
      } cands(w.substring(i, i + k)) =
        cands.getOrElse(w.substring(i, i + k), 0L) + n
    }
    def bits(u: Long) = java.lang.Long.toBinaryString(u).length.toLong
    val top = cands.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(Unigram.SeedVocab).toMap
    val chars = cands.filter(_._1.length == 1)
    val scores0 = (top ++ chars).map { case (p, c) => p -> bits(c) }
    def usage(scores: Map[String, Long]): Map[String, Long] = {
      val u = scala.collection.mutable.HashMap[String, Long]()
      words.foreach { case (w, n) =>
        Unigram.segment(w, scores).foreach(p =>
          u(p) = u.getOrElse(p, 0L) + n)
      }
      u.toMap
    }
    val u1 = usage(scores0.toMap)
    val scores1 = u1.map { case (p, u) => p -> bits(u) } ++
      chars.keySet.filterNot(u1.contains).map(_ -> bits(0L)).toMap
    val u2 = usage(scores1)
    val expect = u2.toSeq.sortBy { case (p, u) => (-u, p) }.take(32)
      .map { case (p, u) => (p, u, bits(u)) }
    val got = Unigram.d42UnigramTrain(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // d43's per-length report folds the same round-2 segmentation
    val lens = scala.collection.mutable.HashMap[Long, (Long, Long)]()
    words.foreach { case (w, n) =>
      val k = Unigram.segment(w, scores1).length.toLong
      val (a, b) = lens.getOrElse(w.length.toLong, (0L, 0L))
      lens(w.length.toLong) = (a + n, b + n * k)
    }
    val gotApply = Unigram.d43UnigramApply(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(gotApply == lens.toMap)
  }
}
