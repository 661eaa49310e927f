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

  /** q72: SLIDING approximate distinct — 7-day distinct users per
    * event type as a WINDOWED HLL UNION: one partial-agg pass folds
    * events into per-(type, day) sketches (constant bytes each), then
    * a RANGE-frame window unions 7 daily sketches per output row —
    * O(days x types) union work however many events feed a day.
    *
    * This is the sketch complement of q50's exact rewrite: q50's
    * explode costs O(events x 7) rows; the sketch path touches each
    * event once and slides over day-level state — at 100 TB the only
    * viable continuous "weekly uniques" metric. The RANGE frame (on
    * the epoch-day index) gives true date semantics even with absent
    * days; mergeable-union associativity is mv06's argument.
    *
    * Gate shape = q59/q60: the exact count (q50's rewrite) is the
    * oracle-checked output, with the sketch estimate proven in-row to
    * sit inside 5% + 2 of it.
    */
  def q72SlidingApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val du = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
      .localCheckpoint(true)
    // Exact side: q50's explode rewrite.
    val spine = du.select(col("event_type"), col("d")).distinct()
    val covered = du
      .select(col("event_type"), col("user_id"), col("d"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(col("event_type"), date_add(col("d"), col("i")).as("wd"), col("user_id"))
      .distinct()
    val exact = spine.alias("sp")
      .join(covered.groupBy(col("event_type"), col("wd")).agg(count(lit(1)).as("u7"))
        .alias("ct"),
        col("sp.event_type") === col("ct.event_type") && col("sp.d") === col("ct.wd"))
      .select(col("sp.event_type"), col("sp.d"), col("u7"))
    // Sketch side: daily HLL sketches, unioned over a date-true RANGE
    // frame on the epoch-day index.
    val daily = du.groupBy(col("event_type"), col("d"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
    val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
      .rangeBetween(-6, 0)
    val est = daily
      .withColumn("usk", expr("hll_union_agg(sk)").over(w))
      .withColumn("est", expr("hll_sketch_estimate(usk)"))
      .select(col("event_type").as("e_t"), col("d").as("e_d"), col("est"))
    exact
      .join(est, col("event_type") === col("e_t") && col("d") === col("e_d"))
      .select(col("event_type"), col("d"), col("u7"),
        (abs(col("est") - col("u7")) <= col("u7") * 0.05 + 2).as("within_bound"))
      .orderBy(col("event_type"), col("d"))
  }

  /** q50's exact oracle + the in-row TRUE envelope (q59's shape). */
  val q72OracleSql: String =
    """WITH du AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, user_id
      |  FROM events),
      |spine AS (SELECT DISTINCT event_type, d FROM du),
      |cov AS (SELECT DISTINCT event_type, d + CAST(i AS INT) AS wd, user_id
      |  FROM du, (SELECT unnest(range(0, 7)) AS i) t),
      |cnt AS (SELECT event_type, wd, count(*) AS u7 FROM cov GROUP BY 1, 2)
      |SELECT spine.event_type, spine.d, cnt.u7, TRUE AS within_bound
      |FROM spine JOIN cnt ON spine.event_type = cnt.event_type AND spine.d = cnt.wd
      |ORDER BY spine.event_type, spine.d""".stripMargin
}
