package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

class CosineSimSpec extends AnyFunSuite with SparkSpec {

  private def run(wholeStage: Boolean): Seq[Double] = {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
    try {
      val df = Seq(
        (Array(1f, 0f, 0f), Array(1f, 0f, 0f)), // identical -> 1
        (Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal -> 0
        (Array(1f, 1f, 0f), Array(1f, 0f, 0f)), // 45 deg -> ~0.7071
        (Array(0f, 0f, 0f), Array(1f, 0f, 0f)) // zero norm -> 0 (not NaN)
      ).toDF("a", "b")
      df.select(VectorFunctions.cosineSimNative($"a", $"b").as("c"))
        .collect().map(_.getDouble(0)).toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  private def check(got: Seq[Double]): Unit = {
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
    assert(math.abs(got(2) - math.sqrt(0.5)) < 1e-6)
    assert(got(3) == 0.0)
  }

  test("CosineSim codegen path") { check(run(wholeStage = true)) }
  test("CosineSim interpreted path") { check(run(wholeStage = false)) }

  test("CosineSim matches the zip_with/aggregate composition") {
    import spark.implicits._
    val df = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding".as("a"))
    val other = Tables.embeddings(spark, sf).limit(5).select($"embedding".as("b"))
    val joined = df.crossJoin(other)
    val rows = joined.select(
      VectorFunctions.cosineSimNative($"a", $"b").as("native"),
      VectorFunctions.cosineSim($"a", $"b").as("composed")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("graft_cosine_sim registered in SQL via extensions") {
    import spark.implicits._
    Seq((Array(1f, 2f), Array(1f, 2f))).toDF("a", "b").createOrReplaceTempView("v_cos")
    val r = spark.sql("SELECT graft_cosine_sim(a, b) AS c FROM v_cos").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-9)
  }
}
