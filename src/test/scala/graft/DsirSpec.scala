package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classifier, Dedup}

/** Brute-force driver-side DSIR replay over the collected sf0.001
  * corpus — plain Scala maps, no Spark aggregation — that must
  * reproduce d40's hashed-bucket counts and whole-bit importance
  * weights exactly, including the unigram+bigram gram set, the add-1
  * smoothing, and the selection rule.
  */
class DsirSpec extends AnyFunSuite with SparkSpec {

  test("d40 equals a brute-force hashed-ngram importance replay") {
    val got = Classifier.d40DsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val ws = r.getString(2).trim.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
        val grams = ws ++ (if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq
                           else Seq.empty)
        val tgt = r.getString(1) == "en" && r.getLong(0) % 3 == 0
        (r.getLong(0), tgt, grams.map(g => Dedup.polyHash(g) % 1024L))
      }

    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val cT = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cR = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    docs.foreach { case (_, tgt, bs) =>
      bs.foreach(b => if (tgt) cT(b) += 1 else cR(b) += 1)
    }
    val nT = cT.values.sum + 1024L
    val nR = cR.values.sum + 1024L

    val pool = docs.filter(d => !d._2 && d._3.nonEmpty).map { case (id, _, bs) =>
      val w = bs.map(b =>
        (bitlen(nR) - bitlen(cR(b) + 1)) - (bitlen(nT) - bitlen(cT(b) + 1))).sum
      (id, w)
    }
    val (wSum, nDocs) = (pool.map(_._2).sum, pool.length.toLong)
    val expect = pool.map { case (id, w) => (id, w, w * nDocs > wSum) }
      .toSeq.sortBy(_._1)

    assert(got.nonEmpty && got == expect)
    // the weight signal is live: both selected and rejected docs occur
    assert(got.exists(_._3) && got.exists(!_._3))
  }
}
