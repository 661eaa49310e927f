package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit tool for the pathological case (one key holding a double-
  * digit percentage of the fact table, or skew under a non-AQE-
  * splittable operation). The left (skewed/fact) side gets a
  * deterministic per-row salt; the right (dim) side is replicated
  * once per salt value, so each (key, salt) shuffle bucket carries
  * ~1/numSalts of the hot key's rows.
  *
  * Cost: right side inflates x numSalts — use only when the right
  * side is small relative to the skew being split.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    // Right-preserving join types would emit numSalts copies of every
    // unmatched right row (the right side is replicated per salt).
    val supported =
      Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support right-preserving joinType '$joinType'")
    // Per-row deterministic salt from the full row content (a salt
    // derived only from the key would keep the hot key in one bucket).
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(numSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** q61: the RUNTIME counterpart to [[saltedJoin]] — AQE skew-join
    * splitting, gated. A deliberately skewed key (one customer owns
    * ~60% of all orders) is joined against the customer dimension
    * under a child session configured so the split actually engages at
    * gate scale: broadcast disabled (the dimension would otherwise
    * broadcast and no shuffle join exists to split), skew thresholds
    * lowered in proportion to the test data (at 100 TB the DEFAULTS —
    * 256 MB partition threshold, 5× median — are the right values;
    * the lowered ones exercise the same code path).
    *
    * The gate proves, in-row, (a) `skew_split`: the final adaptive
    * plan really contains a skew-handled join (`skew=true` on the
    * sort-merge join node), and (b) `result_match`: the split join's
    * aggregate equals the exact same aggregate computed in the parent
    * session's plain plan — AQE splitting is pure plan surgery, never
    * a semantics change. Money stays in integer cents so the equality
    * is bit-exact.
    */
  def q61SkewJoinAqe(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    // ~60% of orders land on customer 42: o_orderkey % 10 IN (0..5).
    // The repartition(8) guarantees the join's shuffle map stage has
    // multiple mappers: AQE splits a skewed REDUCE partition along
    // MAP-output boundaries, so a single-mapper stage (what a
    // one-file gate-scale scan produces) is unsplittable no matter
    // how skewed. At 100 TB the scan has thousands of mappers and
    // this repartition is unnecessary — but it is exactly the
    // many-mapper shape the production shuffle has.
    def skewed(s: SparkSession) = Tables.orders(s, dir).select(
      when(pmod(col("o_orderkey"), lit(10)) < 6, lit(42L))
        .otherwise(col("o_custkey")).as("sk"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .repartition(8)
    def joinedAgg(s: SparkSession): DataFrame =
      skewed(s)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
          col("sk") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("revc"))

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Small median partitions make the hot partition unambiguously
    // skewed even at the smallest gate SF.
    s2.conf.set("spark.sql.shuffle.partitions", "16")
    val adaptive = joinedAgg(s2)
    val got = adaptive.collect() // O(|segments|) — 5 rows
    val skewSplit = adaptive.queryExecution.executedPlan.toString.contains("skew=true")
    val gotMap = got.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val exact = joinedAgg(spark)
    val nMap = map(gotMap.toSeq.flatMap { case (k, (n, _)) => Seq(lit(k), lit(n)) }: _*)
    val rMap = map(gotMap.toSeq.flatMap { case (k, (_, rv)) => Seq(lit(k), lit(rv)) }: _*)
    exact.select(
      col("c_mktsegment"), col("n"), col("revc"),
      lit(skewSplit).as("skew_split"),
      (element_at(nMap, col("c_mktsegment")) === col("n") &&
        element_at(rMap, col("c_mktsegment")) === col("revc")).as("result_match"))
      .orderBy(col("c_mktsegment"))
  }

  val q61OracleSql: String =
    """SELECT c_mktsegment,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revc,
      |  TRUE AS skew_split,
      |  TRUE AS result_match
      |FROM (SELECT CASE WHEN o_orderkey % 10 < 6 THEN 42 ELSE o_custkey END AS sk,
      |        o_totalprice
      |      FROM orders) o
      |JOIN customer ON o.sk = customer.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
