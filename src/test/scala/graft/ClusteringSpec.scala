package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** Brute-force driver-side Lloyd's replay over the collected sf0.001
  * embeddings — the same integer quantization, (dist, cluster)
  * tie-break, nonnegative integer-division means, and empty-cluster
  * inheritance — which must match d41's assignments exactly.
  */
class ClusteringSpec extends AnyFunSuite with SparkSpec {

  test("d41 equals a brute-force integer Lloyd's replay") {
    val got = Clustering.d41Kmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val xs = r.getSeq[Float](1)
        (r.getLong(0),
          xs.map(x => math.floor((x.toDouble + 2.0) * 1000.0).toLong).toArray)
      }.sortBy(_._1)

    val k = Clustering.K
    val seeds = vecs.filter(_._1 < k)
    assert(seeds.length == k)
    val ids = seeds.map(_._1.toInt)
    var cents = seeds.map(_._2)

    def nearest(v: Array[Long]): (Int, Long) = {
      var best = 0; var bd = Long.MaxValue
      for (c <- cents.indices) {
        var d = 0L
        for (i <- v.indices) { val t = v(i) - cents(c)(i); d += t * t }
        if (d < bd) { bd = d; best = c }
      }
      (best, bd)
    }

    for (_ <- 0 until Clustering.Iters) {
      val byC = vecs.groupBy { case (_, v) => nearest(v)._1 }
      cents = cents.zipWithIndex.map { case (old, c) =>
        byC.get(c) match {
          case Some(members) =>
            Array.tabulate(Clustering.Dim) { i =>
              members.map(_._2(i)).sum / members.length
            }
          case None => old
        }
      }
    }

    val expect = vecs.map { case (id, v) =>
      val (c, d) = nearest(v)
      (id, ids(c), d)
    }.toSeq.sortBy(_._1)

    assert(got.nonEmpty && got == expect)
    // clustering is live: more than one cluster is populated
    assert(got.map(_._2).distinct.size > 1)
  }
}
