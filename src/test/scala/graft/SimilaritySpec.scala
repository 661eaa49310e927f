package graft

import org.scalatest.funsuite.AnyFunSuite

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
}
