package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextPipelineSpec extends AnyFunSuite with SparkSpec {

  test("d11 normalization collapses whitespace and strips non-text chars") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-norm").toString
    Seq(
      (0L, "  Hello,   WORLD!!  #42  ", "en", "s", 0L),
      (1L, "already clean text", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = TextAnalysis.d11Normalize(spark, dir).collect()
    // "hello, world 42" after lower/strip/collapse/trim
    val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex("hello, world 42")
    assert(rows(0).getAs[String]("clean_hash") == expected)
    assert(rows(0).getAs[Int]("n_clean") == "hello, world 42".length)
    assert(rows(1).getAs[Int]("n_clean") == "already clean text".length)
  }

  test("d12 redacts planted emails and long numbers, counts them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (0L, "contact alice@example.com or bob.smith@mail.co for info", "en", "s", 0L),
      (1L, "card 12345678901234 expires soon, pin 1234 stays", "en", "s", 0L),
      (2L, "no sensitive content here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = TextAnalysis.d12PiiRedact(spark, dir).collect()
    assert(rows(0).getAs[Int]("n_emails") == 2 && rows(0).getAs[Int]("n_longnums") == 0)
    // 14-digit run redacted; the 4-digit pin is below the threshold
    assert(rows(1).getAs[Int]("n_emails") == 0 && rows(1).getAs[Int]("n_longnums") == 1)
    assert(rows(2).getAs[Int]("n_emails") == 0 && rows(2).getAs[Int]("n_longnums") == 0)
    // scrubbed hash of doc 1 equals the hash of the manually redacted text
    val expected = org.apache.commons.codec.digest.DigestUtils
      .md5Hex("card [NUM] expires soon, pin 1234 stays")
    assert(rows(1).getAs[String]("scrubbed_hash") == expected)
  }

  test("d11/d12 cover every document at the test SF") {
    val n = Tables.documents(spark, sf).count()
    assert(TextAnalysis.d11Normalize(spark, sf).count() == n)
    assert(TextAnalysis.d12PiiRedact(spark, sf).count() == n)
  }
}
