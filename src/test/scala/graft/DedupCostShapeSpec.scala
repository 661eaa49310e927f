package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The NEAR-DUP families' cost SHAPE, pinned: LSH band-bucketing
  * makes candidate-pair work Σ c·(c−1)/2 over same-bucket cluster
  * sizes c — LINEAR in how many clusters exist, QUADRATIC in how big
  * each cluster is. This is why the SF=1 corpus (make_sf1.py plants a
  * 10-duplicate cluster per document) scales the near-dup gates
  * superlinearly while everything else scales ~linearly: the
  * generator multiplies CLUSTER SIZE, not cluster count. Data-shaped,
  * not an engine regression — and this spec is the machine-checked
  * form of that claim.
  */
class DedupCostShapeSpec extends AnyFunSuite with SparkSpec {

  /** Planted-cluster corpus: for each (tag, size) make `size` EXACT
    * duplicates of a distinct text. Exact dups share every band in
    * every bucket — the worst (and SF=1's) collision shape.
    */
  private def planted(sizes: Seq[Int]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = sizes.zipWithIndex.flatMap { case (c, k) =>
      val text = s"cluster $k body " +
        (0 until 12).map(j => s"w${k}x$j").mkString(" ")
      (0 until c).map(i => ((k * 1000 + i).toLong, text))
    }
    rows.toDF("doc_id", "text")
  }

  private def candidatePairs(docs: org.apache.spark.sql.DataFrame): Long = {
    val bands = Dedup.bandRowsOf(docs)
    bands.as("a").join(bands.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .distinct().count()
  }

  test("candidate pairs == sum of c*(c-1)/2 over planted cluster sizes") {
    val sizes = Seq(1, 2, 3, 5, 10)
    val expect = sizes.map(c => c.toLong * (c - 1) / 2).sum // 0+1+3+10+45
    assert(candidatePairs(planted(sizes)) == expect)
    // bucket-size distribution: every band's buckets are exactly the
    // cluster sizes (exact dups collide in all NBands bands; the
    // planted texts never collide across clusters)
    val hist = Dedup.bandRowsOf(planted(sizes))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("band_idx"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .collect()
    assert(hist.length == Dedup.NBands)
    hist.foreach { r =>
      assert(r.getSeq[Long](1).sorted == sizes.sorted.map(_.toLong),
        s"band ${r.get(0)} buckets")
    }
  }

  test("pair work is quadratic in cluster SIZE, linear in cluster COUNT") {
    // same total docs (40): 4 clusters of 10 vs 20 clusters of 2
    val big = candidatePairs(planted(Seq.fill(4)(10)))    // 4 * 45
    val small = candidatePairs(planted(Seq.fill(20)(2)))  // 20 * 1
    assert(big == 180L && small == 20L)
    // doubling cluster COUNT doubles pairs ...
    assert(candidatePairs(planted(Seq.fill(8)(10))) == 360L)
    // ... doubling cluster SIZE ~quadruples them (c=5: 10, c=10: 45)
    assert(candidatePairs(planted(Seq.fill(4)(5))) == 40L)
  }
}
