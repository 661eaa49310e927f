package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Engine, Tables}
import graft.operators.Relational

/** Dev-only micro-probe: decompose the slow benchmark queries into
  * plan stages and time each variant warm (min of 3 after warmup).
  * Not part of the driver contract.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("local[16]", "graft-probe", 16)

    def time(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val best = (1 to 3).map(_ => once()).min
      println(f"[probe] $name%-40s $best%8.3fs")
    }

    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)

    time("li scan only")(li)
    time("li filter+project")(
      li.filter(col("l_quantity") >= 48.0 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice")))
    time("q02 full (with orderBy)")(Relational.q02FilterProject(spark, dir))
    time("orders scan only")(o)
    time("orders topn no to_date")(
      o.orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20))
    time("q03 full")(Relational.q03TopN(spark, dir))
    time("q22 full")(Relational.q22AsOfJoin(spark, dir))

    // as-of decomposition
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    time("q22 purchases only")(purchases)
    val ordersDedup = o.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    time("q22 ordersDedup only")(ordersDedup)
    time("q22 asof no final sort")(
      graft.operators.AsOfJoin.asOf(purchases, ordersDedup,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey")))

    println("=== q02 plan ===")
    Relational.q02FilterProject(spark, dir).explain("formatted")
    println("=== q22 plan ===")
    Relational.q22AsOfJoin(spark, dir).explain("formatted")
    spark.stop()
  }
}
