package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Engine
import graft.operators.{Dedup, Similarity}

/** Dev tool: measure whether the approximate operators (LSH/IVF ANN,
  * MinHash/SimHash dedup) reproduce their exact counterparts on the
  * fixed test corpora — the empirical basis for the brute-equivalence
  * oracles in SparkEntry.oracleSql.
  */
object RecallProbe {
  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.mkString("|")).toSet

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark: SparkSession = Engine.session("local[16]", "graft-recall", 16)
    dirs.foreach { dir =>
      val brute = rows(Similarity.s01AnnBrute(spark, dir))
      val lsh = rows(Similarity.s02AnnLsh(spark, dir))
      val ivf = rows(Similarity.s03AnnIvf(spark, dir))
      println(s"### $dir s02==s01: ${lsh == brute} (missing ${(brute -- lsh).size}, extra ${(lsh -- brute).size})")
      println(s"### $dir s03==s01: ${ivf == brute} (missing ${(brute -- ivf).size}, extra ${(ivf -- brute).size})")

      val d06 = Dedup.d06DedupMinhash(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val d07 = Dedup.d07DedupSimhash(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
      println(s"### $dir d06 nontrivial: ${d06.count(kv => kv._1 != kv._2)}  d07 nontrivial: ${d07.count(kv => kv._1 != kv._2)}  d06==d07: ${d06 == d07}")
    }
    spark.stop()
  }
}
