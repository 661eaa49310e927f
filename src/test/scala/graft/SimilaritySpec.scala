package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, round}

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("s01 brute-force: 5 ranked neighbors per query, ranks dense, cos sorted") {
    val rows = Similarity.s01AnnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to 5))
      val cs = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s02 LSH: results are a plausible subset (recall@5 vs brute force > 0)") {
    val brute = Similarity.s01AnnBrute(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val lsh = Similarity.s02AnnLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(lsh.nonEmpty)
    // LSH neighbors must rank identically when they coincide with brute's.
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f (candidates bounded by buckets)")
    assert(recall > 0.0)
  }

  test("TopKByScore aggregate matches the window/row_number reference") {
    val scored = Similarity.bruteScored(spark, sf)
    val agg = Similarity.s01AnnBrute(spark, sf).collect().map(_.toString).toSeq
    val win = Similarity.topKWindow(scored).collect().map(_.toString).toSeq
    assert(agg == win)
  }

  test("d09 embedding dedup maps every vector; canonical <= vec_id") {
    val rows = Similarity.d09EmbeddingDedup(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach(r =>
      assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("vec_id")))
  }

  private def writeEmbeddings(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("LSH bits derived from corpus size keep buckets growing with n") {
    import spark.implicits._
    // buckets ~ n / 2^bits: lshBitsFor must scale bits with log2(n) so
    // the mean bucket size (candidate volume per vector) stays pinned
    // instead of growing linearly — the 100 TB knob.
    assert(Similarity.lshBitsFor(256) < Similarity.lshBitsFor(1 << 20))
    assert(Similarity.lshBitsFor(1L << 40) - Similarity.lshBitsFor(1L << 20) == 20)

    val rnd = new scala.util.Random(7)
    def vecs(n: Int) = (0 until n).map(i =>
      (i.toLong, Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat), 0))
    val small = vecs(100).toDF("vec_id", "embedding", "label")
    val big = vecs(1600).toDF("vec_id", "embedding", "label")
    val bSmall = Similarity.bucketCount(small, 2, Similarity.lshBitsFor(100))
    val bBig = Similarity.bucketCount(big, 2, Similarity.lshBitsFor(1600))
    assert(bBig > bSmall, s"buckets did not grow: $bSmall -> $bBig")
    // mean bucket size stays in the same ballpark at both sizes
    val meanSmall = 100.0 * 2 / bSmall
    val meanBig = 1600.0 * 2 / bBig
    assert(meanBig < meanSmall * 4,
      s"bucket size blew up with corpus growth: $meanSmall -> $meanBig")
  }

  test("s02 LSH recall@5 >= 0.8 at production knobs on clustered embeddings") {
    // The production configuration: 4 tables, bits derived from the
    // corpus size by lshBitsFor — the knobs a 100 TB run uses. Same
    // clustered corpus recipe as the IVF floor (approximation quality
    // is only meaningful when the data clusters).
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(Similarity.Dim)(rnd.nextGaussian()))
    def member(k: Int): Array[Float] = {
      val c = centers(k)
      Array.tabulate(Similarity.Dim)(i => (c(i) + 0.15 * rnd.nextGaussian()).toFloat)
    }
    val queries = (0 until 10).map(q => (q.toLong, member(q % 8), q % 8))
    val corpus = (0 until 400).map(i => (10L + i, member(i % 8), i % 8))
    val dir = writeEmbeddings(queries ++ corpus)

    val bits = Similarity.lshBitsFor(400)
    val brute = Similarity.s01AnnBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val lsh = Similarity.s02AnnLsh(spark, dir, nTables = 4, bits = bits).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f (tables=4, bits=$bits from lshBitsFor)")
    assert(recall >= 0.8, f"LSH recall $recall%.2f below floor at production knobs")
  }

  test("IVF recall@5 >= 0.8 with nProbe=2/8 on clustered embeddings") {
    // IVF's approximation is meaningful when the corpus clusters (on
    // uniform-random vectors no coarse quantizer can beat brute force).
    // 8 well-separated direction clusters; queries sit near centers.
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(Similarity.Dim)(rnd.nextGaussian()))
    def member(k: Int): Array[Float] = {
      val c = centers(k)
      Array.tabulate(Similarity.Dim)(i => (c(i) + 0.15 * rnd.nextGaussian()).toFloat)
    }
    // vec_id < 10 are the queries (one per cluster + extras)
    val queries = (0 until 10).map(q => (q.toLong, member(q % 8), q % 8))
    val corpus = (0 until 400).map(i => (10L + i, member(i % 8), i % 8))
    val dir = writeEmbeddings(queries ++ corpus)

    val brute = Similarity.s01AnnBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf = Similarity.s03AnnIvf(spark, dir, nClusters = 8, nProbe = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f (nProbe=2 of 8 lists)")
    assert(recall >= 0.8, f"IVF recall $recall%.2f below floor on clustered data")
  }

  test("exhaustive-probe IVF equals brute force exactly (partition completeness)") {
    val brute = Similarity.s01AnnBrute(spark, sf).collect().map(_.toString).toSeq
    val ivf = Similarity.s03AnnIvf(spark, sf).collect().map(_.toString).toSeq
    assert(ivf == brute)
  }

  test("s05 quantized ANN: int8 coarse + rescore recovers the brute top-5") {
    // int8 cosine preserves neighborhoods well enough that the true
    // top-5 sits inside the coarse top-50 — rescore then returns
    // exactly the brute answer on the test corpus. (The gate's oracle
    // replays the pipeline, so this spec is the recall statement.)
    val brute = Similarity.s01AnnBrute(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val quant = Similarity.s05AnnQuantized(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    info(f"quantized-ANN recall@5 = $recall%.2f (coarse C=50)")
    assert(recall >= 0.9, f"quantized rescore recall $recall%.2f below floor")
    // Shrinking the coarse stage to C=5 makes the result exactly the
    // coarse ranking's top-5 — still a valid ANN, spec just pins shape.
    val tight = Similarity.s05AnnQuantized(spark, sf, coarseC = 5).collect()
    assert(tight.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5))
  }

  test("s04 int8 quantization: scale and error bound hold for every vector") {
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)).toMap
    val out = Similarity.s04Quantize(spark, sf).collect()
    assert(out.length == raw.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val scale = r.getDouble(1)
      val err = r.getDouble(3)
      val xs = raw(id)
      val maxAbs = xs.map(math.abs).max
      // scale is max|x|/127 (round 8)
      assert(math.abs(scale - maxAbs / 127.0) < 5e-9, s"vec $id scale")
      // per-element quantization error <= scale/2, so the L2 error is
      // bounded by sqrt(dim) * scale / 2
      val bound = math.sqrt(xs.length) * (maxAbs / 127.0) / 2 + 1e-6
      assert(err >= 0 && err <= bound, s"vec $id err $err > bound $bound")
    }
  }

  test("s04 codes round-trip: dequantized vector ranks like the original") {
    // Quantization must preserve nearest-neighbor structure well enough
    // that the top-1 neighbor under dequantized cosine matches the exact
    // top-1 for most queries (int8 keeps ~2 decimal digits per weight).
    val ex = Similarity.s01AnnBrute(spark, sf).collect()
      .filter(_.getInt(1) == 1).map(r => (r.getLong(0), r.getLong(2))).toMap
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    def quantized(xs: Array[Double]): Array[Double] = {
      val maxAbs = xs.map(math.abs).max
      if (maxAbs == 0) xs
      else {
        val s = maxAbs / 127.0
        xs.map(x => math.floor(x / s + 0.5) * s)
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val queries = raw.filter(_._1 < 10).map { case (id, xs) => (id, quantized(xs)) }
    val corpus = raw.filter(_._1 >= 10).map { case (id, xs) => (id, quantized(xs)) }
    val hits = queries.count { case (qid, qv) =>
      val top1 = corpus.maxBy { case (nid, nv) => (cos(qv, nv), -nid) }._1
      ex(qid) == top1
    }
    assert(hits >= 8, s"quantized top-1 agreement $hits/10 below floor")
  }

  test("s06 MaxSim matches a brute-force late-interaction replay") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    val byDoc = raw.groupBy(_._1 / Similarity.MaxSimGroup)
      .view.mapValues(_.sortBy(_._1).map(_._2)).toMap
    val (qDocs, cDocs) = (byDoc.filter(_._1 < 3), byDoc.filter(_._1 >= 3))
    val expected = qDocs.map { case (qd, qToks) =>
      val scores = cDocs.map { case (cd, cToks) =>
        (cd, qToks.map(qt => cToks.map(ct => cos(qt, ct)).max).sum)
      }.toSeq
      qd -> scores.sortBy { case (cd, s) => (-s, cd) }.take(5)
    }
    val got = Similarity.s06MaxSim(spark, sf).collect()
    assert(got.length == qDocs.size * 5)
    got.foreach { r =>
      val (qd, rnk, cd, ms) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      val (expCd, expMs) = expected(qd)(rnk - 1)
      assert(cd == expCd, s"q_doc $qd rnk $rnk: $cd != $expCd")
      assert(math.abs(ms - expMs) < 1e-3, s"q_doc $qd rnk $rnk score")
    }
  }

  test("s07 range search returns exactly the above-threshold pairs") {
    val brute = Similarity.bruteScored(spark, sf)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = brute.filter(_._3 >= Similarity.RangeSearchTau)
      .map(x => (x._1, x._2)).toSet
    val got = Similarity.s07RangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "tau admits no pairs — the gate would be vacuous")
    // The ball is wider than top-k for at least one query (the point of
    // radius search), and every returned score clears the floor.
    Similarity.s07RangeSearch(spark, sf).collect()
      .foreach(r => assert(r.getDouble(2) >= Similarity.RangeSearchTau))
  }

  test("s09 filtered ANN: neighbors share the query label; equals brute with filter") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Similarity.s09AnnFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // label constraint holds for every returned pair
    rows.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(2)),
        s"neighbor ${r.getLong(2)} label mismatch for query ${r.getLong(0)}")
    }
    // brute replay: per query, rank label-matched candidates by cosine
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val (qs, cs) = embs.partition(_._1 < 10)
    val want = qs.flatMap { case (qid, qe, ql) =>
      cs.filter(_._3 == ql)
        .map { case (nid, ne, _) => (nid, cos(qe, ne)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, _), i) => (qid, i + 1, nid) }
    }.toSet
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == want)
  }

  test("s10 hybrid search: fusion actually reranks, and alpha=0 degrades to pure cosine") {
    import org.apache.spark.sql.functions.col
    val pure = graft.operators.Similarity
      .s10HybridSearch(spark, sf, term = "spark", alpha = 0.0)
      .select(col("q_id"), col("rnk"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val s01 = graft.operators.Similarity.s01AnnBrute(spark, sf)
      .select(col("q_id"), col("rnk"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(pure == s01, "alpha=0 must be exactly the vector-only top-k")
    val fused = graft.operators.Similarity
      .s10HybridSearch(spark, sf, term = "spark", alpha = 10.0)
      .select(col("q_id"), col("rnk"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused != s01, "a dominant lexical weight must change the ranking")
  }

  test("s11 indexed ANN equals s02, and index appends serve new vectors incrementally") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.GraftLake
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    assert(rows(Similarity.s11AnnIndexed(spark, sf)) ==
      rows(Similarity.s02AnnLsh(spark, sf)),
      "stored-index query must equal the per-query signature pass")

    // Incremental maintenance: index HALF the corpus, append the other
    // half's signatures, and the queries must see the full corpus.
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val path = java.nio.file.Files.createTempDirectory("graft-s11")
      .resolve("idx").toString
    val (half1, half2) =
      (c.filter(col("n_id") % 2 === 0), c.filter(col("n_id") % 2 === 1))
    GraftLake.create(Similarity.lshIndexRelation(half1, 4, 8), path,
      statsCols = Seq("sig"))
    GraftLake.append(Similarity.lshIndexRelation(half2, 4, 8), path,
      statsCols = Seq("sig"))
    assert(rows(Similarity.queryLshIndex(spark, path, q, c)) ==
      rows(Similarity.s02AnnLsh(spark, sf)),
      "appended signatures must serve queries like a full rebuild")
  }

  test("s12 CDC maintenance hashes only the delta and answers for the full corpus") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.GraftLake
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    assert(rows(Similarity.s12AnnIndexMaintain(spark, sf)) ==
      rows(Similarity.s02AnnLsh(spark, sf)),
      "the maintained index must answer exactly like a fresh full-corpus pass")
    // Structural proof of incrementality: the index log is
    // create + ONE append (never a rebuild commit), and the append's
    // row count is exactly |delta| x nTables signatures.
    val idxPath = graft.SparkEntry.scratch("graft_lsh_index_maint", sf)
    val cs = GraftLake.commits(idxPath)
    assert(cs.map(_.action) == Seq("create", "append"),
      "maintenance must append to the index, not rebuild it")
    assert(cs(1).remove.isEmpty, "maintenance must not rewrite index sets")
    val emb = Tables.embeddings(spark, sf)
    val nDelta = emb.filter(col("vec_id") >= 10)
      .filter(col("vec_id") % 2 =!= 0).count()
    val appended = spark.read
      .parquet(s"$idxPath/${cs(1).add.head}").count()
    assert(appended == nDelta * Similarity.DefaultTables,
      s"append must hold exactly delta x tables signature rows, got $appended")
  }

  test("s13 PQ-ADC: coarse-then-rescore recovers the brute top-5 (recall >= 0.8)") {
    val brute = Similarity.s01AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.s13AnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet == brute.keySet)
    val recall = brute.map { case (q, want) =>
      (pq(q) intersect want).size.toDouble / want.size
    }.sum / brute.size
    assert(recall >= 0.8, s"PQ recall@5 = $recall")
    // Every result list is a full, densely-ranked top-5.
    pq.values.foreach(ids => assert(ids.size == 5))
  }

  test("s15: stored PQ index serves identically to in-memory s13, maintained by delta only") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.GraftLake
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    assert(rows(Similarity.s15PqIndexed(spark, sf)) ==
      rows(Similarity.s13AnnPq(spark, sf)),
      "stored-index ADC must equal the in-memory PQ pass exactly")
    // Incrementality: the code table's log is create + ONE append of
    // exactly |delta| code rows; the codebook table is immutable.
    val codesPath = graft.SparkEntry.scratch("graft_pq_codes", sf)
    val cs = GraftLake.commits(codesPath)
    assert(cs.map(_.action) == Seq("create", "append"))
    assert(cs(1).remove.isEmpty, "maintenance must not rewrite code sets")
    val emb = Tables.embeddings(spark, sf)
    val nDelta = emb.filter(col("vec_id") >= 10)
      .filter(col("vec_id") % 2 =!= 0).count()
    assert(spark.read.parquet(s"$codesPath/${cs(1).add.head}").count() == nDelta)
    val cbPath = graft.SparkEntry.scratch("graft_pq_codebooks", sf)
    assert(GraftLake.commits(cbPath).map(_.action) == Seq("create"))
    // Codebooks round-trip the lake bit-exactly.
    val cb = Similarity.sampleCodebooks(spark, sf)
    val loaded = Similarity.loadCodebooks(spark, cbPath)
    assert(cb.length == loaded.length)
    assert(cb.indices.forall(m => cb(m).indices.forall(k =>
      cb(m)(k).sameElements(loaded(m)(k)))))
  }

  test("s16: stored IVF index equals exhaustive s03, lists maintained by delta only") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.GraftLake
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    // Both probe exhaustively, so both ARE brute force — equal sets.
    assert(rows(Similarity.s16IvfIndexed(spark, sf)) ==
      rows(Similarity.s03AnnIvf(spark, sf)),
      "stored-index IVF serving must equal the in-memory s03 pass")
    // Incrementality: the list table's log is create + ONE append of
    // exactly |delta| assignment rows; the quantizer is immutable.
    val listPath = graft.SparkEntry.scratch("graft_ivf_lists", sf)
    val cs = GraftLake.commits(listPath)
    assert(cs.map(_.action) == Seq("create", "append"))
    assert(cs(1).remove.isEmpty, "maintenance must not rewrite list sets")
    val emb = Tables.embeddings(spark, sf)
    val nDelta = emb.filter(col("vec_id") >= 10)
      .filter(col("vec_id") % 2 =!= 0).count()
    assert(spark.read.parquet(s"$listPath/${cs(1).add.head}").count() == nDelta)
    val centPath = graft.SparkEntry.scratch("graft_ivf_centroids", sf)
    assert(GraftLake.commits(centPath).map(_.action) == Seq("create"))
  }

  test("s18: stored IVF-PQ-residual index is maintained by delta only; tables immutable") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.GraftLake
    // Run the lifecycle (also the gated path) to materialize tables.
    val out = Similarity.s18IvfPqIndexed(spark, sf).collect()
    assert(out.length == 50)
    val codesPath = graft.SparkEntry.scratch("graft_ivfpq_codes", sf)
    val cs = GraftLake.commits(codesPath)
    assert(cs.map(_.action) == Seq("create", "append"))
    assert(cs(1).remove.isEmpty, "maintenance must not rewrite code sets")
    val emb = Tables.embeddings(spark, sf)
    val nDelta = emb.filter(col("vec_id") >= 10)
      .filter(col("vec_id") % 2 =!= 0).count()
    assert(spark.read.parquet(s"$codesPath/${cs(1).add.head}").count() == nDelta)
    // Quantizer and codebooks are immutable O(lists)/O(M×K) tables.
    val centPath = graft.SparkEntry.scratch("graft_ivfpq_centroids", sf)
    val cbPath = graft.SparkEntry.scratch("graft_ivfpq_codebooks", sf)
    assert(GraftLake.commits(centPath).map(_.action) == Seq("create"))
    assert(GraftLake.commits(cbPath).map(_.action) == Seq("create"))
    assert(GraftLake.read(spark, centPath).count() == Similarity.IvfPqLists)
    // Residual discrimination sanity: codes are not all identical (the
    // flat-PQ within-list collapse the residual encoding exists to fix).
    val codes = GraftLake.read(spark, codesPath)
    assert(codes.select(col("codes")).distinct().count() > 1)
  }

  test("s19: filtered stored-index serving equals s09; labels live in the index") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.GraftLake
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    // Probe-all + in-index label filter == the brute filtered pass.
    assert(rows(Similarity.s19IvfFilteredIndexed(spark, sf)) ==
      rows(Similarity.s09AnnFiltered(spark, sf)),
      "stored filtered index must equal the brute filtered pass")
    // The list relation carries the filter column — ids+cluster+label
    // only, never vectors.
    val listPath = graft.SparkEntry.scratch("graft_ivff_lists", sf)
    assert(GraftLake.read(spark, listPath).columns.toSeq ==
      Seq("n_id", "cluster", "label"))
  }

  test("s14: erased vectors never serve, and the erasure rewrote no data") {
    val rows = Similarity.s14AnnIndexDelete(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getLong(2) % 9 != 4, s"erased vector served: ${r.getLong(2)}")
      assert(r.getBoolean(4), "zero-rewrite proof must hold")
    }
  }

  test("d29 semantic dedup: planted near-duplicates collapse, distinct vectors survive") {
    val rnd = new scala.util.Random(31)
    def vec(): Array[Float] = Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)
    // 40 base vectors; vectors 100..109 are near-copies of 20..29
    // (tiny perturbation keeps cosine > tau); the rest are random and
    // far apart with overwhelming probability at dim 64.
    val base = (0 until 100).map(i => (i.toLong, vec(), 0))
    val dups = (0 until 10).map { i =>
      val src = base(20 + i)._2
      (100L + i, src.map(x => x + 1e-4f * rnd.nextGaussian().toFloat), 0)
    }
    val dir = writeEmbeddings(base ++ dups)
    val out = Similarity.d29SemanticDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 110, "every vector labeled exactly once")
    val canon = out.map(r => r._1 -> r._2).toMap
    (0 until 10).foreach { i =>
      assert(canon(100L + i) == canon(20L + i),
        s"planted dup ${100 + i} must share ${20 + i}'s component")
      assert(canon(20L + i) == 20L + i, "the lower id is canonical")
    }
    // kept <=> canonical, and canonical ids are always <= the member.
    out.foreach { case (id, c, kept) =>
      assert(c <= id)
      assert(kept == (c == id))
    }
    assert(out.count(!_._3) == 10, "exactly the planted dups are dropped")
  }

  test("ivf-pq residual: recall >= 0.8 on clustered embeddings with partial probing") {
    // Same clustered recipe as the IVF/LSH floors — the regime where
    // residual encoding matters (flat PQ codes collapse within tight
    // clusters; the residual re-centers each list on the codebook).
    val rnd = new scala.util.Random(47)
    val centers = Array.fill(8)(Array.fill(Similarity.Dim)(rnd.nextGaussian()))
    def member(k: Int): Array[Float] = {
      val c = centers(k)
      Array.tabulate(Similarity.Dim)(i => (c(i) + 0.15 * rnd.nextGaussian()).toFloat)
    }
    val queries = (0 until 10).map(q => (q.toLong, member(q % 8), q % 8))
    val corpus = (0 until 400).map(i => (10L + i, member(i % 8), i % 8))
    val dir = writeEmbeddings(queries ++ corpus)
    val brute = Similarity.s01AnnBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val got = Similarity.ivfPqResidual(spark, dir, nLists = 8, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    info(f"IVF-PQ residual recall@5 = $recall%.2f (nProbe=2 of 8 lists)")
    assert(recall >= 0.8, f"IVF-PQ recall $recall%.2f below floor on clustered data")
  }

  test("ivf-pq residual: 8-bit codebooks (K=256) hold at least the 4-bit recall") {
    // Same clustered recipe; K=256 codebooks rank within-list
    // candidates 16x more finely than K=16, so at the same probe and
    // rescore budget recall may only improve.
    val rnd = new scala.util.Random(53)
    val centers = Array.fill(8)(Array.fill(Similarity.Dim)(rnd.nextGaussian()))
    def member(k: Int): Array[Float] = {
      val c = centers(k)
      Array.tabulate(Similarity.Dim)(i => (c(i) + 0.15 * rnd.nextGaussian()).toFloat)
    }
    val queries = (0 until 10).map(q => (q.toLong, member(q % 8), q % 8))
    val corpus = (0 until 400).map(i => (10L + i, member(i % 8), i % 8))
    val dir = writeEmbeddings(queries ++ corpus)
    val brute = Similarity.s01AnnBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    def recallAt(k: Int): Double = {
      val got = Similarity.ivfPqResidual(spark, dir, nLists = 8, nProbe = 2,
        pqK = k).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val r16 = recallAt(16)
    val r256 = recallAt(256)
    info(f"IVF-PQ residual recall@5: K=16 $r16%.2f, K=256 $r256%.2f")
    assert(r256 >= r16, f"8-bit codebooks regressed recall: $r256%.2f < $r16%.2f")
    assert(r256 >= 0.9, f"K=256 recall $r256%.2f below floor on clustered data")
  }

  test("pqTrain: Lloyd refinement never increases quantization error") {
    val emb = Tables.embeddings(spark, sf)
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val init = Similarity.sampleCodebooks(spark, sf)
    val e0 = Similarity.pqError(spark, c, init)
    val refined = Similarity.pqTrain(spark, c, init, iters = 2)
    val e1 = Similarity.pqError(spark, c, refined)
    // Lloyd is monotone per exact arithmetic; allow float-mean slack.
    assert(e1 <= e0 * (1 + 1e-9), s"refined $e1 vs init $e0")
    assert(e1 < e0, "two Lloyd iterations must strictly improve on sample init here")
    // Refined codebooks keep the same shape (M x K x sub).
    assert(refined.length == Similarity.PqM)
    assert(refined.forall(_.length == Similarity.PqK))
    assert(refined.forall(_.forall(_.length == Similarity.PqSub)))
  }
}
