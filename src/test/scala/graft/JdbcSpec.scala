package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JdbcSpec extends AnyFunSuite with SparkSpec {

  private val drv = "org.apache.derby.jdbc.EmbeddedDriver"

  private def freshUrl(): String = {
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
    val db = java.nio.file.Files.createTempDirectory("graft-jdbc")
      .resolve("db").toString
    s"jdbc:derby:$db;create=true"
  }

  test("jdbc round trip via embedded Derby is value-exact") {
    val url = freshUrl()
    val o = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.write.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_T").option("driver", drv).save()
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_T").option("driver", drv).load()
    assert(back.count() == o.count())
    assert(back.exceptAll(o).count() == 0 && o.exceptAll(back).count() == 0)
  }

  test("partitioned jdbc read fans out to range-query tasks; filters push down") {
    val url = freshUrl()
    val o = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_totalprice"))
    o.write.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_T").option("driver", drv).save()
    val b = o.agg(min("o_orderkey"), max("o_orderkey")).head
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_T").option("driver", drv)
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", b.getLong(0)).option("upperBound", b.getLong(1))
      .option("numPartitions", 4)
      .load()
    assert(back.rdd.getNumPartitions == 4, "one concurrent range query per task")
    assert(back.count() == o.count(), "range partitions must tile exactly")
    // Predicate pushdown: the filter must reach the remote SQL, not
    // Spark — visible as PushedFilters on the JDBC relation.
    val filtered = back.filter(col("o_totalprice") > 300000.0)
    val desc = filtered.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters") && desc.contains("o_totalprice"),
      s"filter did not push into JDBC scan:\n$desc")
    val expected = o.filter(col("o_totalprice") > 300000.0).count()
    assert(filtered.count() == expected)
  }
}
