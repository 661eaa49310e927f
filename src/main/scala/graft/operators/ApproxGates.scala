package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.{ApproxDistinctRule, ApproxPercentileRule}

/** Error-bound gates for the opt-in approximate rewrite rules
  * (SURVEY.md §2 engine extensions): each gated query runs the
  * aggregate twice — once in a child session with the rule ENABLED
  * (so the analyzer swaps in the sketch) and once exact — and emits,
  * per group, the exact value plus two booleans the oracle replays as
  * literal TRUE:
  *
  *   - `rewrite_fired`: the child session's analyzed plan really
  *     contains the sketch aggregate (the gate fails if the rule ever
  *     silently stops firing);
  *   - `within_bound`: the sketch answer is inside the sketch's
  *     published error envelope of the exact answer.
  *
  * The child session ([[SparkSession.newSession]]) shares the
  * SparkContext but has its OWN SQLConf, so enabling the rewrite key
  * never leaks into the exact half of this query or into the other
  * gate queries running concurrently on the shared session.
  *
  * The only driver-side transfer is the per-group sketch result —
  * O(|groups|) = 3 rows here — folded back in as a map literal; both
  * aggregate passes stay fully distributed.
  */
object ApproxGates {

  /** q59: COUNT(DISTINCT) vs HyperLogLog++. The rule's default rsd is
    * 5%; the gate allows 3σ = 15% relative error — at any scale the
    * HLL++ estimate concentrates far inside that (the sketch is
    * deterministic for a given dataset, so a green gate stays green).
    * At 100 TB the rewrite replaces an Expand + full shuffle of the
    * distinct key universe with a constant-size mergeable sketch.
    */
  def q59ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set(ApproxDistinctRule.ConfKey, "true")
    val approxDf = Tables.lineitem(s2, dir)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("approx_nd"))
    val fired = approxDf.queryExecution.analyzed.toString
      .contains("approx_count_distinct")
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val amap = map(approx.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("exact_nd"))
      .select(
        col("l_returnflag"), col("exact_nd"),
        (abs(element_at(amap, col("l_returnflag")) - col("exact_nd"))
          <= col("exact_nd") * lit(0.15)).as("within_bound"),
        lit(fired).as("rewrite_fired"))
      .orderBy(col("l_returnflag"))
  }

  val q59OracleSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_nd,
      |  TRUE AS within_bound,
      |  TRUE AS rewrite_fired
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q60: exact percentile vs ApproximatePercentile (Greenwald-Khanna
    * style sketch, default accuracy 10000 ⇒ rank error ≤ 1e-4). The
    * gate brackets the sketch's median between the exact 49th and 51st
    * percentiles — a ±0.01 RANK envelope, 100× the sketch's published
    * bound — checked in integer-cents space. The exact presentation
    * column doubles the cents median so the half-step interpolation
    * value is an exact integer in both engines (no float hash risk).
    * At 100 TB the rewrite replaces per-group buffering of every value
    * with O(accuracy) mergeable sketch state.
    */
  def q60ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val centsSql = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    val s2 = spark.newSession()
    s2.conf.set(ApproxPercentileRule.ConfKey, "true")
    val approxDf = Tables.lineitem(s2, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr(s"percentile($centsSql, 0.5)").as("approx_p50"))
    val fired = approxDf.queryExecution.analyzed.toString
      .contains("percentile_approx")
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val amap = map(approx.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      // ONE percentile aggregate with an array of fractions — three
      // separate percentile() calls would each buffer the column
      // independently (3× the state and sort work for the same rows).
      .agg(expr(s"percentile($centsSql, array(0.49D, 0.5D, 0.51D))").as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 2).as("p50c"),
        element_at(col("ps"), 1).as("lo"),
        element_at(col("ps"), 3).as("hi"))
      .select(
        col("l_returnflag"),
        round(col("p50c") * 2).cast("long").as("p50c_x2"),
        element_at(amap, col("l_returnflag"))
          .between(col("lo"), col("hi")).as("within_bound"),
        lit(fired).as("rewrite_fired"))
      .orderBy(col("l_returnflag"))
  }

  val q60OracleSql: String =
    """SELECT l_returnflag,
      |  CAST(round(2 * quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)) AS BIGINT) AS p50c_x2,
      |  TRUE AS within_bound,
      |  TRUE AS rewrite_fired
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
}
