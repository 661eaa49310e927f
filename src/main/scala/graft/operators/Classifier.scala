package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Trainable document classifiers for corpus curation — the
  * CCNet/GPT-3 "quality classifier" stage re-expressed as pure
  * relational aggregation: train on a labeled slice, score the rest,
  * no gradient loop, no driver-side feature matrix.
  */
object Classifier {

  /** d39: MULTINOMIAL NAIVE-BAYES CLASSIFIER — the classic trainable
    * curation gate (CCNet trains a linear classifier to keep
    * "Wikipedia-like" pages; GPT-3's quality filter is the same
    * shape). Train on the docs with `doc_id % 5 != 0` (label =
    * `lang`), predict the held-out `doc_id % 5 == 0` slice, emit one
    * row per scored doc with the argmin-surprisal label and a
    * correctness flag.
    *
    * NO-ln DISCIPLINE (the d26/d36 lesson): every log is a whole-bit
    * integer — for add-1-smoothed p(w|l) = (c(w,l)+1) / (n_l + V),
    * per-occurrence surprisal is bitlen(n_l + V) - bitlen(c(w,l)+1)
    * with bitlen(x) = length(bin(x)), exact and identical in Spark
    * and DuckDB; the class prior contributes bitlen(N) - bitlen(d_l).
    * Argmin ties break by label text — deterministic under any
    * partitioning.
    *
    * Scale shape: training is ONE corpus pass (explode + partial-agg
    * groupBy (label, word)); the model frame is localCheckpointed and
    * reused for vocab (O(model) count), label totals (O(model)
    * groupBy), and the scoring join. Scoring is tf (one pass over the
    * held-out slice) × a BROADCAST O(labels) dim, left-joined against
    * the model on (label, word) — AQE broadcasts the model when it
    * fits, else it shuffles on the word key; never pairwise in docs.
    * The per-doc argmin window partitions by doc_id over exactly
    * |labels| rows — bounded by design, not by SF.
    */
  def d39NbClassifier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        array_remove(split(col("text"), " "), "").as("ws"))
    val train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val test = docs.filter(pmod(col("doc_id"), lit(5)) === 0)

    // ONE training pass: per-(label, word) occurrence counts. The
    // checkpoint feeds vocab, label totals, AND the scoring join
    // without re-reading the corpus.
    val model = train
      .select(col("lang").as("l"), explode(col("ws")).as("w"))
      .groupBy(col("l"), col("w")).agg(count(lit(1)).as("c_wl"))
      .localCheckpoint(true)
    val vocab = model.select(col("w")).distinct().count()
    // O(labels) dim rows: word mass n_l and doc count d_l per label —
    // driver-side prior/denominator bit-lengths, broadcast back.
    val labelRows = model.groupBy(col("l")).agg(sum(col("c_wl")).as("n_l"))
      .join(train.groupBy(col("lang").as("l")).agg(count(lit(1)).as("d_l")), "l")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nTrain = labelRows.map(_._3).sum
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val labels = spark.createDataFrame(labelRows.toSeq.map { case (l, nl, dl) =>
      (l, bitlen(nTrain) - bitlen(dl), bitlen(nl + vocab))
    }).toDF("l", "prior_bits", "den_bits")

    // Held-out term frequencies × the label dim, surprisal-summed.
    val tf = test.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val scored = tf.crossJoin(broadcast(labels))
      .join(model, Seq("l", "w"), "left")
      .groupBy(col("doc_id"), col("l"), col("prior_bits"))
      .agg(sum(col("tf") * (col("den_bits") -
        length(bin(coalesce(col("c_wl"), lit(0L)) + lit(1L))))).as("wbits"))
      .withColumn("score_bits",
        (col("prior_bits") + col("wbits")).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_bits"), col("l"))
    val pred = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("l").as("pred"), col("score_bits"))
    test.select(col("doc_id"), col("lang")).join(pred, "doc_id")
      .withColumn("correct", col("lang") === col("pred"))
      .select(col("doc_id"), col("lang"), col("pred"),
        col("score_bits"), col("correct"))
      .orderBy(col("doc_id"))
  }

  val d39OracleSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |tr AS (SELECT * FROM t WHERE doc_id % 5 <> 0),
      |te AS (SELECT * FROM t WHERE doc_id % 5 = 0),
      |cwl AS (SELECT l, w, count(*) AS c_wl
      |  FROM (SELECT lang AS l, unnest(ws) AS w FROM tr) GROUP BY 1, 2),
      |v AS (SELECT count(DISTINCT w) AS nv FROM cwl),
      |lt AS (SELECT l, CAST(sum(c_wl) AS BIGINT) AS n_l FROM cwl GROUP BY 1),
      |dl AS (SELECT lang AS l, count(*) AS d_l FROM tr GROUP BY 1),
      |n AS (SELECT CAST(sum(d_l) AS BIGINT) AS n_tr FROM dl),
      |lab AS (SELECT lt.l,
      |    length(bin(n.n_tr)) - length(bin(dl.d_l)) AS prior_bits,
      |    length(bin(lt.n_l + v.nv)) AS den_bits
      |  FROM lt JOIN dl USING (l) CROSS JOIN v CROSS JOIN n),
      |tf AS (SELECT doc_id, w, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(ws) AS w FROM te) GROUP BY 1, 2),
      |sc AS (SELECT tf.doc_id, lab.l, lab.prior_bits,
      |    sum(tf.tf * (lab.den_bits -
      |      length(bin(COALESCE(cwl.c_wl, 0) + 1)))) AS wbits
      |  FROM tf CROSS JOIN lab
      |  LEFT JOIN cwl ON cwl.l = lab.l AND cwl.w = tf.w
      |  GROUP BY 1, 2, 3),
      |r AS (SELECT doc_id, l,
      |    CAST(prior_bits + wbits AS BIGINT) AS score_bits,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY prior_bits + wbits, l) AS rn
      |  FROM sc)
      |SELECT te.doc_id, te.lang, r.l AS pred, r.score_bits,
      |  te.lang = r.l AS correct
      |FROM te JOIN r ON te.doc_id = r.doc_id AND r.rn = 1
      |ORDER BY te.doc_id""".stripMargin
}
