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

  /** d40: DSIR-STYLE IMPORTANCE WEIGHTS (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") —
    * hashed n-gram importance weighting, the other standard trainable
    * curation gate: estimate a target and a raw feature distribution
    * over hashed unigram+bigram buckets, then weight every candidate
    * document by log p_target(doc) - log p_raw(doc). Target sample =
    * the `lang = 'en' AND doc_id % 3 == 0` slice (a curated seed set);
    * the candidate pool is everything else.
    *
    * Same NO-ln DISCIPLINE as d39: with add-1 smoothing over B
    * buckets, per-occurrence weight is
    *   (bitlen(N_raw + B) - bitlen(c_raw(b)+1))     [raw surprisal]
    * - (bitlen(N_tgt + B) - bitlen(c_tgt(b)+1))     [target surprisal]
    * — whole-bit integers, exact in both engines. `selected` keeps
    * docs whose total weight clears the corpus MEAN weight (the
    * resampling acceptance rule collapsed to a deterministic
    * threshold; compared by integer cross-multiplication
    * `w * n_docs > sum_w`, so no division enters the hash).
    *
    * Scale shape: feature extraction is ONE corpus pass (typed flatMap
    * — one polyHash per gram, the same Horner hash the dedup family
    * replays in DuckDB); the bucket dim is B=1024 rows groupBy'd with
    * map-side partial aggregation, localCheckpointed, and BROADCAST
    * back; scoring is a per-doc tf against that broadcast dim. The
    * only collect is the O(1) distribution totals. Never pairwise,
    * no windows, bounded by B — not by SF.
    */
  def d40DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = 1024L
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang") === "en" &&
          pmod(col("doc_id"), lit(3)) === 0,
        array_remove(split(lower(trim(col("text"))), " "), ""))
      .as[(Long, Boolean, Seq[String])]
    // One row per hashed unigram/bigram OCCURRENCE (counts, not sets —
    // the estimator is multinomial).
    val feats = docs.flatMap { case (id, tgt, ws) =>
      val grams = ws.iterator ++
        (if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")) else Iterator.empty)
      grams.map(g => (id, tgt, Dedup.polyHash(g) % B))
    }.toDF("doc_id", "tgt", "b")

    val dim = feats.groupBy(col("b")).agg(
        sum(when(col("tgt"), 1L).otherwise(0L)).as("c_t"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("c_r"))
      .localCheckpoint(true)
    val totals = dim.agg(sum(col("c_t")), sum(col("c_r"))).head()
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val nTBits = bitlen(totals.getLong(0) + B)
    val nRBits = bitlen(totals.getLong(1) + B)

    val weights = feats.filter(!col("tgt"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("tf"))
      .join(broadcast(dim), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * (
        (lit(nRBits) - length(bin(col("c_r") + lit(1L)))) -
        (lit(nTBits) - length(bin(col("c_t") + lit(1L))))
      )).cast("long").as("weight_bits"))
      .localCheckpoint(true)
    // Selection threshold = corpus mean weight: one scalar aggregate
    // over the already per-doc-reduced frame, broadcast back as
    // literals — no global sort/window at any SF.
    val t = weights.agg(sum(col("weight_bits")), count(lit(1))).head()
    weights
      .withColumn("selected",
        col("weight_bits") * lit(t.getLong(1)) > lit(t.getLong(0)))
      .select(col("doc_id"), col("weight_bits"), col("selected"))
      .orderBy(col("doc_id"))
  }

  /** Full DuckDB replay of d40 — identical tokenization, gram set,
    * Horner bucket hash (list_reduce, the d06 pattern), add-1 bit
    * arithmetic, and selection rule.
    */
  val d40OracleSql: String = {
    import Dedup.{M, StrBase}
    s"""WITH t AS (SELECT doc_id,
       |    (lang = 'en' AND doc_id % 3 = 0) AS tgt,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS ws
       |  FROM documents),
       |g AS (SELECT doc_id, tgt,
       |    list_concat(ws, CASE WHEN len(ws) >= 2
       |      THEN [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]
       |      ELSE [] END) AS gs
       |  FROM t),
       |f AS (SELECT doc_id, tgt,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CAST(unicode(gr[i:i]) AS BIGINT) FOR i IN range(1, length(gr) + 1)]),
       |      (a, c) -> (a * $StrBase + c) % $M) % 1024 AS b
       |  FROM (SELECT doc_id, tgt, unnest(gs) AS gr FROM g)),
       |dim AS (SELECT b,
       |    sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_t,
       |    sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS c_r
       |  FROM f GROUP BY 1),
       |n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
       |             CAST(sum(c_r) AS BIGINT) AS n_r FROM dim),
       |w AS (SELECT f.doc_id,
       |    CAST(sum((length(bin(n.n_r + 1024)) - length(bin(dim.c_r + 1)))
       |           - (length(bin(n.n_t + 1024)) - length(bin(dim.c_t + 1))))
       |      AS BIGINT) AS weight_bits
       |  FROM f JOIN dim USING (b) CROSS JOIN n
       |  WHERE NOT f.tgt GROUP BY 1),
       |thr AS (SELECT CAST(sum(weight_bits) AS BIGINT) AS w_sum,
       |               CAST(count(*) AS BIGINT) AS n_docs FROM w)
       |SELECT doc_id, weight_bits,
       |  weight_bits * thr.n_docs > thr.w_sum AS selected
       |FROM w CROSS JOIN thr ORDER BY doc_id""".stripMargin
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
