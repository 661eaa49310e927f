package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object SparkSpec {
  lazy val spark: SparkSession = Engine.session(
    "local[4]", "graft-test", 4,
    Map("spark.sql.warehouse.dir" ->
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
  val Sf = "/root/testdata/sf0.001"
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.Sf
}
