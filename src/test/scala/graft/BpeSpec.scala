package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkSpec {

  /** Straight-line reference BPE trainer: in-memory maps, explicit
    * greedy left-to-right merge application — no Spark, no SQL.
    */
  private def referenceBpe(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => (w.map(_.toString).toList, n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((r, a, b, cnt))
        vocab = vocab.toSeq.map { case (syms, n) =>
          // greedy left-to-right, non-overlapping
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toList, n)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.toSeq
  }

  test("d30 distributed BPE training equals the sequential reference trainer") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat", "the hat and the cat", "banana bandana",
      "low lower lowest", "new newer newest", "the the the aaa aa a",
      "widest wider wide", "Hello, World! hello world")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.train(docs, rounds = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == referenceBpe(texts, 8))
  }

  test("d30 overlapping-run merges apply left-to-right ('a a a' -> 'aa a')") {
    import spark.implicits._
    // One word "aaaa": round 1 elects (a,a) with weight 3 pairs; the
    // greedy merge yields "aa aa", so round 2 elects (aa,aa).
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.train(docs, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  /** Reference tokenizer: re-train with the reference trainer, then
    * apply its merges greedily per word and count token frequencies.
    */
  private def referenceTokenFreqs(
      texts: Seq[String], rounds: Int): Map[String, Long] = {
    val merges = referenceBpe(texts, rounds).map { case (_, a, b, _) => (a, b) }
    val words = texts
      .flatMap(_.toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" "))
      .filter(_.nonEmpty)
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { w =>
      var syms = w.map(_.toString).toList
      merges.foreach { case (a, b) =>
        val merged = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.toList
      }
      syms.foreach(t => freqs(t) = freqs.getOrElse(t, 0L) + 1L)
    }
    freqs.toMap
  }

  test("d31 token frequencies equal per-word reference merge application") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat", "the hat and the cat", "banana bandana",
      "low lower lowest", "new newer newest", "the the the aaa aa a",
      "widest wider wide", "Hello, World! hello world")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-d31").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val got = Bpe.d31BpeTokenize(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = referenceTokenFreqs(texts, Bpe.MergeRounds).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(20)
    assert(got == expect && got.nonEmpty)
  }

  test("d30 gate query returns MergeRounds rows on the corpus") {
    val df = Bpe.d30BpeTrain(spark, sf)
    val rows = df.collect()
    assert(rows.length == Bpe.MergeRounds)
    assert(rows.map(_.getInt(0)).toSeq == (1 to Bpe.MergeRounds))
    // Pair counts are non-increasing only per-merge-availability, but
    // every elected count must be positive.
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("train-to-convergence equals fixed-round training while counts clear the floor, then stops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // On the gate corpus every one of the first MergeRounds elections
    // clears a floor of 2, so the convergence loop capped at the same
    // budget must land the IDENTICAL merge table — the gated unrolled
    // oracle keeps covering the loop variant.
    def table(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val docs = Tables.documents(spark, sf)
    val fixed = table(Bpe.train(docs, rounds = Bpe.MergeRounds))
    assert(fixed.forall(_._4 >= 2L), "gate corpus precondition")
    val (convDf, convVocab) =
      Bpe.trainToConvergence(docs, minPairCount = 2L,
        maxMerges = Bpe.MergeRounds)
    convVocab.unpersist()
    assert(table(convDf) == fixed)

    // A corpus of singleton words: every pair count is 1, so a floor
    // of 2 stops BEFORE the first merge; a floor of 1 merges until
    // pairs run out entirely (all single-symbol words) — convergence,
    // not a round budget, ends both runs.
    val tiny = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val (none, v0) = Bpe.trainToConvergence(tiny, minPairCount = 2L)
    v0.unpersist()
    assert(none.count() == 0)
    val (all, v1) = Bpe.trainToConvergence(tiny, minPairCount = 1L)
    val exhaustedVocab = v1.select(col("w")).collect().map(_.getString(0))
    v1.unpersist()
    // 3 two-char words -> 3 merges, then no adjacent pairs remain.
    assert(all.count() == 3)
    assert(exhaustedVocab.toSet == Set("ab", "cd", "ef"))
  }

  test("d33: stored-merges apply equals the shared training-chain tokenize") {
    import graft.sources.GraftLake
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // The deployment path (persist merges → reload → one-pass apply)
    // must land the IDENTICAL report as the in-memory chain.
    assert(rows(Bpe.d33BpeStored(spark, sf)) == rows(Bpe.d31BpeTokenize(spark, sf)))
    // The tokenizer artifact is an immutable create-only lake table of
    // exactly MergeRounds rows.
    val mergesPath = graft.SparkEntry.scratch("graft_bpe_merges", sf)
    assert(GraftLake.commits(mergesPath).map(_.action) == Seq("create"))
    assert(GraftLake.read(spark, mergesPath).count() == Bpe.MergeRounds)
  }
}
