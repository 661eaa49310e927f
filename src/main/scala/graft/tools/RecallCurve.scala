package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Similarity

/** Dev tool: the RECALL/LATENCY CURVE for the approximate ANN paths —
  * does `lshBitsFor`'s auto-bit scaling hold recall as the corpus
  * grows 10×, and what does each (tables, bits) / nProbe setting buy?
  *
  * Synthesizes deterministic gaussian corpora (seeded per vec_id, so
  * every run and every parallelism sees identical vectors) at n ∈
  * {10k, 100k}, computes exact brute-force truth once per corpus, and
  * sweeps s02 (tables × bits) and s03 (nProbe). Prints a markdown
  * table for the README. Recall@5 = |approx ∩ brute| / |brute| over
  * the 10 fixed queries.
  *
  * Run: sbt "runMain graft.tools.RecallCurve [outDirBase]"
  */
object RecallCurve {

  /** Cluster-structured corpus: 64 centers, each vector = its
    * cluster's center + small noise (intra-cluster cosine ~0.97), all
    * from per-(id,j) hashes — deterministic at any parallelism. Pure
    * random gaussians would be the WRONG benchmark: with no structure
    * the "top-5" are barely closer than the bulk and every ANN method
    * measures near-zero recall; real embedding corpora (and the
    * TESTDATA embeddings) are clustered, which is what makes ANN a
    * meaningful operation at all.
    */
  private def synthCorpus(spark: SparkSession, n: Int, base: String): String = {
    val dir = s"$base/n$n"
    val path = s"$dir/embeddings.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      val dim = Similarity.Dim
      def u(seed: String, idCol: String = "id") =
        s"(pmod(hash($idCol, j, $seed), 1000) / 1000.0 - 0.5)"
      val df = spark.range(0, n, 1, 32).select(
        col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, ${dim - 1}), j ->
             |  CAST(${u("100", "pmod(id, 64)")} * 2.0
             |       + ${u("1")} * 0.2 AS FLOAT))""".stripMargin).as("embedding"),
        (col("id") % 16).cast("int").as("label"))
      df.write.mode("overwrite").parquet(path)
    }
    dir
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_recall_curve")
    // Optional filters for targeted (re)measurement: arg 2 restricts
    // to one corpus size, arg 3 = "pqonly" skips the LSH/IVF/flat-PQ
    // sweeps (brute truth always runs — recall needs it).
    val nFilter = args.lift(1).map(_.toInt)
    val pqOnly = args.lift(2).contains("pqonly")
    val spark = Engine.session("local[16]", "graft-recall-curve", 16)
    println("| n | operator | config | recall@5 | wall s |")
    println("| --- | --- | --- | --- | --- |")
    // 1M is the decade where LSH bucket skew and IVF list imbalance
    // start to show — the auto-bits / residual-PQ claims need it.
    Seq(10000, 100000, 1000000).filter(n => nFilter.forall(_ == n))
      .foreach { n =>
      val dir = synthCorpus(spark, n, base)
      val (brute, tBrute) = timed(pairs(Similarity.s01AnnBrute(spark, dir)))
      println(f"| $n | s01 brute | exact | 1.000 | $tBrute%.1f |")
      val autoBits = Similarity.lshBitsFor(n)
      if (!pqOnly) for (tables <- Seq(2, 4, 8); bits <- Seq(autoBits - 2, autoBits)) {
        val (got, t) = timed(pairs(Similarity.s02AnnLsh(spark, dir, tables, bits)))
        val recall = got.intersect(brute).size.toDouble / brute.size
        val tag = if (bits == autoBits) s"bits=$bits(auto)" else s"bits=$bits"
        println(f"| $n | s02 lsh | tables=$tables $tag | $recall%.3f | $t%.1f |")
      }
      val lists = math.max(8, math.sqrt(n.toDouble).toInt / 2)
      if (!pqOnly) for (nProbe <- Seq(1, 4, 8)) {
        val (got, t) = timed(pairs(Similarity.s03AnnIvf(spark, dir, lists, nProbe)))
        val recall = got.intersect(brute).size.toDouble / brute.size
        println(f"| $n | s03 ivf | lists=$lists nProbe=$nProbe | $recall%.3f | $t%.1f |")
      }
      if (!pqOnly) {
      val (gotPq, tPq) = timed(pairs(Similarity.s13AnnPq(spark, dir)))
      val rPq = gotPq.intersect(brute).size.toDouble / brute.size
      println(f"| $n | s13 pq-adc | M=8 K=16 C=150 sample-init | $rPq%.3f | $tPq%.1f |")
      val (gotPqR, tPqR) = timed(pairs(Similarity.s13AnnPqRefined(spark, dir)))
      val rPqR = gotPqR.intersect(brute).size.toDouble / brute.size
      println(f"| $n | s13 pq-adc | M=8 K=16 C=150 refined(2 Lloyd) | $rPqR%.3f | $tPqR%.1f |")
      }
      for (nProbe <- Seq(4, 8)) {
        // Rescore budget scales with the probed candidate volume —
        // C is the PQ recall knob once the coarse lists are right.
        // The 1M measurement forced the deeper budget: at 12.5% of
        // probed (the 100k-tuned /8) recall reads 0.80; 4-bit codes
        // (K=16) rank ~16k same-cluster candidates too coarsely, so
        // the big-corpus budget is 25% of probed.
        val probed = n * nProbe / lists
        val budgets = if (n >= 1000000) Seq(8, 4) else Seq(8)
        for (b <- budgets) {
          val cC = math.max(150, probed / b)
          val (got, t) = timed(pairs(
            Similarity.ivfPqResidual(spark, dir, lists, nProbe, coarseC = cC)))
          val r = got.intersect(brute).size.toDouble / brute.size
          println(f"| $n | ivf-pq residual | lists=$lists nProbe=$nProbe C=$cC | $r%.3f | $t%.1f |")
        }
        // 8-bit codebooks (K=256, FAISS's standard) at the big-corpus
        // decades: the structural knob the 4-bit rows max out without —
        // within-list ranking sharpens 16×, so the rescore budget can
        // stay at the 100k-tuned probed/8.
        if (n >= 100000) {
          val cC = math.max(150, probed / 8)
          val (got, t) = timed(pairs(Similarity.ivfPqResidual(
            spark, dir, lists, nProbe, coarseC = cC, pqK = 256)))
          val r = got.intersect(brute).size.toDouble / brute.size
          println(f"| $n | ivf-pq residual | lists=$lists nProbe=$nProbe C=$cC K=256 | $r%.3f | $t%.1f |")
        }
      }
    }
    spark.stop()
  }
}
