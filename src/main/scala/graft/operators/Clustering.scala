package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-space clustering for corpus curation — the SemDeDup /
  * cluster-then-sample stage (Abbas et al. 2023; Tirumala et al. 2023
  * both cluster embeddings with k-means before deduplicating or
  * sampling inside clusters) re-expressed as bounded Spark passes.
  */
object Clustering {

  /** Number of clusters; initial centroids are the K smallest vec_ids. */
  val K = 8
  /** Lloyd iterations (centroid updates) before the final assignment. */
  val Iters = 2
  /** Embedding dimensionality (pinned by the testdata generator). */
  val Dim: Int = Similarity.Dim

  /** d41: K-MEANS CLUSTER ASSIGNMENT over the embeddings table —
    * Lloyd's algorithm on INTEGER-QUANTIZED vectors so every distance,
    * sum, and mean is exact integer arithmetic that DuckDB replays
    * bit-for-bit (the d26/d36/d39 no-float-accumulation discipline:
    * float sums are order-dependent, integer sums are not).
    *
    * Quantization q_i = floor((x_i + 2.0) * 1000.0) — cast-to-double
    * is exact, one double add + multiply are identical IEEE ops in
    * both engines, and the +2.0 offset keeps every code nonnegative so
    * truncating and flooring division agree. Distances are invariant
    * under the shared offset.
    *
    * Scale shape: each Lloyd iteration is ONE typed pass (nearest
    * centroid per row against a closure-captured O(K*Dim) centroid
    * array — never a join against an SF-sized side) followed by a
    * partial-aggregated groupBy over (cluster, dim) = O(K*Dim) rows
    * collected to the driver. Empty clusters keep their previous
    * centroid (standard Lloyd's). Ties break toward the lower cluster
    * index — deterministic under any partitioning. The final output
    * is one assignment pass: (vec_id, cluster, dist).
    */
  def d41Kmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quant = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor((x.cast("double") + lit(2.0d)) * lit(1000.0d)).cast("long")).as("q"))
      .as[(Long, Seq[Long])]
      .map { case (id, v) => (id, v.toArray) }
      .localCheckpoint(true) // every iteration re-reads this tiny projection
    val qDs = quant.toDF("vec_id", "q").as[(Long, Array[Long])]

    val seeds = qDs.filter(col("vec_id") < K).collect().sortBy(_._1)
    require(seeds.length == K, s"need $K seed vectors, got ${seeds.length}")
    // Cluster ids are the SEED vec_ids (ascending, so index order and
    // id order agree — the (dist, cluster) tie-break is preserved);
    // the oracle labels clusters the same way.
    val seedIds: Array[Int] = seeds.map(_._1.toInt)
    var centroids: Array[Array[Long]] = seeds.map(_._2)

    def nearest(cents: Array[Array[Long]], v: Array[Long]): (Int, Long) = {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val ct = cents(c)
        var d = 0L
        var i = 0
        while (i < v.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, bestD)
    }

    var it = 0
    while (it < Iters) {
      val cents = centroids
      val sums = qDs.flatMap { case (_, v) =>
          val c = nearest(cents, v)._1
          v.iterator.zipWithIndex.map { case (x, i) => (c, i, x) }
        }
        .toDF("c", "i", "v")
        .groupBy(col("c"), col("i"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect() // O(K*Dim) rows
      val next = centroids.map(_.clone())
      sums.groupBy(_.getInt(0)).foreach { case (c, rows) =>
        val arr = new Array[Long](Dim)
        // floorDiv, not '/': the DuckDB oracle's '//' FLOORS while
        // Scala '/' truncates toward zero — they agree only on
        // nonnegative sums, which would silently couple the gate to
        // every embedding being >= -2.0 in the quantization offset.
        rows.foreach(r =>
          arr(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3)))
        next(c) = arr
      }
      centroids = next
      it += 1
    }

    val cents = centroids
    qDs.map { case (id, v) =>
        val (c, d) = nearest(cents, v)
        (id, seedIds(c), d)
      }
      .toDF("vec_id", "cluster", "dist")
      .orderBy(col("vec_id"))
  }

  /** Full DuckDB replay of d41: identical quantization, two unrolled
    * Lloyd iterations (assignment via the same (dist, c) tie-break;
    * means via nonnegative integer division; empty clusters inherit
    * the previous centroid through the LEFT JOIN + COALESCE), then the
    * final assignment.
    */
  val d41OracleSql: String = {
    def assign(name: String, cents: String): String =
      s"""$name AS (SELECT vec_id, c, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
         |  FROM (SELECT q.vec_id, $cents.c,
         |      CAST(list_sum([(q.q[i] - $cents.cq[i]) * (q.q[i] - $cents.cq[i])
         |        FOR i IN range(1, ${Dim + 1})]) AS BIGINT) AS dist
         |    FROM q CROSS JOIN $cents))""".stripMargin
    def update(mName: String, uName: String, aName: String): String =
      s"""$mName AS (SELECT c, r.i AS i, sum(q[r.i]) AS s, count(*) AS n
         |  FROM (SELECT a.c, q.q FROM $aName a JOIN q USING (vec_id) WHERE a.rn = 1) t
         |  CROSS JOIN range(1, ${Dim + 1}) r(i)
         |  GROUP BY 1, 2),
         |$uName AS (SELECT c, list(CAST(s // n AS BIGINT) ORDER BY i) AS cq
         |  FROM $mName GROUP BY c)""".stripMargin
    s"""WITH q AS (SELECT vec_id,
       |    [CAST(floor((CAST(x AS DOUBLE) + 2.0) * 1000.0) AS BIGINT)
       |     FOR x IN embedding] AS q
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INT) AS c, q AS cq FROM q WHERE vec_id < $K),
       |${assign("a0", "c0")},
       |${update("m0", "u0", "a0")},
       |c1 AS (SELECT c0.c, COALESCE(u0.cq, c0.cq) AS cq
       |  FROM c0 LEFT JOIN u0 USING (c)),
       |${assign("a1", "c1")},
       |${update("m1", "u1", "a1")},
       |c2 AS (SELECT c1.c, COALESCE(u1.cq, c1.cq) AS cq
       |  FROM c1 LEFT JOIN u1 USING (c)),
       |${assign("a2", "c2")}
       |SELECT vec_id, c AS cluster, dist FROM a2 WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  }
}
