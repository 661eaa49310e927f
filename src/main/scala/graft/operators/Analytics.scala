package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the event stream (SURVEY.md §2:
  * q62-q64) — the funnel / cohort / histogram triad every analytics
  * engine ships and the COVID reference's daily-series queries imply.
  */
object Analytics {

  /** q62: ORDERED funnel — users who viewed, then clicked AFTER their
    * first view, then purchased AFTER that first click. Each stage is
    * one per-user min-timestamp aggregate plus an equi-join on
    * user_id (O(users) state, shuffle keyed on the high-cardinality
    * user) — never a per-user event-sequence sort: the min-ts
    * chaining makes order matching an aggregate property, which is
    * what survives a 100 TB event table.
    */
  def q62Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    def stage(of: String, after: DataFrame): DataFrame =
      e.filter(col("event_type") === of)
        .join(after.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val c = stage("click", v)
    val p = stage("purchase", c)
    def count1(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("users")).select(lit(tag).as("stage"), col("users"))
    count1(v, "stage1_view")
      .unionByName(count1(c, "stage2_click"))
      .unionByName(count1(p, "stage3_purchase"))
      .orderBy(col("stage"))
  }

  val q62OracleSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT 'stage1_view' AS stage, count(*) AS users FROM v
      |UNION ALL SELECT 'stage2_click', count(*) FROM c
      |UNION ALL SELECT 'stage3_purchase', count(*) FROM p
      |ORDER BY stage""".stripMargin

  /** q63: COHORT RETENTION — users grouped by first-active day, and
    * for offsets 0..6, how many were active k days later. Two
    * aggregates (first-seen per user; distinct active (user, day))
    * joined on user_id; the result is |cohorts| × 7 rows. The
    * distinct collapses the fact table before any join, so the shape
    * is O(users × active-days), not O(events).
    */
  def q63Cohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val first = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"))
    val act = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    first.join(act, "user_id")
      .select(col("d0").as("cohort_day"), datediff(col("d"), col("d0")).as("k"))
      .filter(col("k").between(0, 6))
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_day"), col("k"))
  }

  val q63OracleSql: String =
    """WITH first AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
      |  FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      |SELECT first.d0 AS cohort_day, (act.d - first.d0) AS k,
      |  count(*) AS users
      |FROM first JOIN act ON first.user_id = act.user_id
      |WHERE (act.d - first.d0) BETWEEN 0 AND 6
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q65: MATCH_RECOGNIZE-style PATTERN match — strictly CONSECUTIVE
    * view→click→purchase inside a user's event sequence (q62's funnel
    * only requires order; this requires adjacency, the sequence-regex
    * primitive). Two lags over a window PARTITIONED by the
    * high-cardinality user key — per-user state is 2 rows, no
    * unpartitioned sort anywhere — then a daily count of completed
    * patterns.
    */
  def q65PatternMatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .filter(col("p2") === "view" && col("p1") === "click" &&
        col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("d"))
  }

  val q65OracleSql: String =
    """WITH seq AS (
      |  SELECT ts, event_type,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
      |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
      |  FROM events)
      |SELECT CAST(ts AS DATE) AS d, count(*) AS n_matches
      |FROM seq
      |WHERE p2 = 'view' AND p1 = 'click' AND event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q66: DISCRETE percentiles (nearest-rank, `percentile_disc`
    * semantics) — unlike q34's continuous form, the answer is an
    * actual data value, so integer cents hash-match exactly with no
    * rounding discipline at all. Runs on the shuffle-free
    * histogram-narrowing machinery (Percentiles.exactByHistogram,
    * discrete mode): ~2× faster than the built-in sort-based
    * `percentile_disc WITHIN GROUP` aggregate at sf0.1, and the
    * per-group state stays O(buckets) instead of O(rows). The SQL
    * surface form is spec-proven equal.
    */
  def q66PercentileDisc(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    Percentiles.exactByHistogram(
      cents, "l_returnflag", "cents",
      Seq(0.25, 0.5, 0.9), Seq("p25c", "p50c", "p90c"), discrete = true)
      .select(col("l_returnflag"),
        col("p25c").cast("long").as("p25c"),
        col("p50c").cast("long").as("p50c"),
        col("p90c").cast("long").as("p90c"))
      .orderBy(col("l_returnflag"))
  }

  /** The SQL-surface twin of [[q66PercentileDisc]] (built-in
    * sort-based aggregate) — spec-compared against the histogram path.
    */
  def q66SqlSurface(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT l_returnflag,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS p25c,
        |  CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY cents) AS BIGINT) AS p50c,
        |  CAST(percentile_disc(0.9)  WITHIN GROUP (ORDER BY cents) AS BIGINT) AS p90c
        |FROM (SELECT l_returnflag,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin)

  val q66OracleSql: String =
    """SELECT l_returnflag,
      |  CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS BIGINT) AS p25c,
      |  CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS BIGINT) AS p50c,
      |  CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9) AS BIGINT) AS p90c
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q67: deterministic MODE — most frequent order-priority per
    * status, ties broken by the SMALLEST value. Built relationally
    * (count per (group, value) → per-group max-count filter → min
    * value) instead of the engine's `mode()` aggregate, whose
    * tie-breaking is engine-defined — determinism is what makes the
    * answer portable. Two partial aggs + one small self-join, all
    * keyed on group columns.
    */
  def q67Mode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("f"))
    val best = counts.groupBy(col("o_orderstatus")).agg(max(col("f")).as("fmax"))
    counts.alias("c")
      .join(best.alias("b"),
        col("c.o_orderstatus") === col("b.o_orderstatus") &&
          col("c.f") === col("b.fmax"))
      .groupBy(col("c.o_orderstatus").as("o_orderstatus"))
      .agg(min(col("c.o_orderpriority")).as("mode_priority"),
        max(col("c.f")).as("mode_n"))
      .orderBy(col("o_orderstatus"))
  }

  val q67OracleSql: String =
    """WITH counts AS (
      |  SELECT o_orderstatus, o_orderpriority, count(*) AS f
      |  FROM orders GROUP BY 1, 2),
      |best AS (SELECT o_orderstatus, max(f) AS fmax FROM counts GROUP BY 1)
      |SELECT c.o_orderstatus, min(c.o_orderpriority) AS mode_priority,
      |  max(c.f) AS mode_n
      |FROM counts c JOIN best b
      |  ON c.o_orderstatus = b.o_orderstatus AND c.f = b.fmax
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q68: SEMI-ADDITIVE measure — month-end balance. `o_totalprice`
    * plays an account balance: per (customer, month) take the LAST
    * value in time (non-additive over time), then SUM across
    * customers (additive over accounts) — the snapshot-fact pattern
    * every finance warehouse runs, which plain SUM gets wrong. The
    * last-per-period step is a row_number window partitioned by the
    * high-cardinality (customer, month) key; the cross-account sum is
    * an ordinary partial agg on the |months|-sized result.
    */
  def q68SemiAdditive(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = date_trunc("month", col("o_orderdate")).cast("date")
    val w = Window.partitionBy(col("o_custkey"), m)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(m.as("month"))
      .agg(count(lit(1)).as("n_accounts"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("eom_cents"))
      .orderBy(col("month"))
  }

  val q68OracleSql: String =
    """WITH last AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    o_custkey, o_totalprice,
      |    row_number() OVER (
      |      PARTITION BY o_custkey, date_trunc('month', o_orderdate)
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders WHERE o_orderdate IS NOT NULL)
      |SELECT month, count(*) AS n_accounts,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS eom_cents
      |FROM last WHERE rn = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q64: equi-width HISTOGRAM of order value per status — integer
    * bucket arithmetic ($1000 buckets over integer cents), a single
    * partial-agg groupBy on (status, bucket): the binning primitive
    * behind every distribution dashboard, O(groups × buckets) output
    * regardless of row count.
    */
  def q64Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(col("o_orderstatus"),
        expr("cents div 100000").as("bucket"), col("cents"))
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy(col("o_orderstatus"), col("bucket"))

  val q64OracleSql: String =
    """SELECT o_orderstatus,
      |  CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q71: ANOMALY DAYS — flag days whose per-type daily total spikes
    * more than 2 sample standard deviations ABOVE that type's mean
    * (the COVID case-spike / outage-detection shape: "which days are
    * statistical outliers in the daily series").
    *
    * The z-score test runs in EXACT INTEGER algebra — no float mean or
    * variance anywhere, so no summation-order or sqrt rounding can
    * diverge between engines. With x = a day's cents total, n / S / Q
    * the per-type day count / sum / sum-of-squares,
    *
    *   (x - S/n) > 2 * sqrt((nQ - S^2) / (n (n-1)))
    *     <=>  (xn - S) > 0  AND  (xn - S)^2 (n-1) > 4 n (nQ - S^2)
    *
    * both sides exact in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
    * the square-free form of the 2-sigma inequality. Daily totals are
    * one partial-agg groupBy over the fact scan (shuffle keyed on
    * (type, day)); the per-type stats table is O(types) rows and
    * broadcast back — at 100 TB the only data-sized pass is the first
    * aggregation.
    */
  /** Daily integer-cents totals per type — additive state: partials
    * from any split of the events merge by summation, which is what
    * lets st16 maintain this table incrementally over a stream.
    */
  def dailyCents(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("cents")).as("x"))

  /** The 2-sigma flag over a (event_type, d, x) day-totals table. */
  def anomalyFrom(day: DataFrame): DataFrame = {
    val dec = col("x").cast("decimal(38,0)")
    val st = day.groupBy(col("event_type")).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(dec).as("s"),
      sum(dec * dec).as("q"))
    // Magnitude fence: both inequality sides must be EXACT in
    // DECIMAL(38,0). Under non-ANSI semantics a decimal overflow is a
    // silent NULL — the filter would silently DROP the day while the
    // HUGEINT oracle keeps it. Refuse loudly instead. The fence runs
    // in doubles over the already-aggregated O(types×days) table
    // (one cheap pass), uses sum-of-magnitudes upper bounds (no
    // cancellation), counts NULL bound terms (an already-overflowed
    // q) as violations, and keeps a decade of slack below 1e38.
    locally {
      val nD = col("n").cast("double"); val sD = abs(col("s").cast("double"))
      val qD = abs(col("q").cast("double")); val xD = abs(col("x").cast("double"))
      val lhsB = (xD * nD + sD) * (xD * nD + sD) * nD
      val rhsB = lit(4.0) * nD * (nD * qD + sD * sD)
      val r = day.join(broadcast(st), "event_type")
        .select(lhsB.as("l"), rhsB.as("r"))
        .agg(sum(when(col("l").isNull || col("r").isNull ||
          col("l") >= 1e37 || col("r") >= 1e37, 1L).otherwise(0L)))
        .head
      val overflows = if (r.isNullAt(0)) 0L else r.getLong(0)
      require(overflows == 0L,
        s"anomaly 2-sigma test: $overflows day-row(s) exceed the " +
          "DECIMAL(38,0) exact range — rescale the measure (e.g. " +
          "aggregate at a coarser unit) rather than silently dropping days")
    }
    val num = dec * col("n") - col("s")
    day.join(broadcast(st), "event_type")
      .filter(num > lit(0) &&
        num * num * (col("n") - lit(1)) >
          lit(4) * col("n") * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type"), col("d"), col("x").as("day_cents"))
      .orderBy(col("event_type"), col("d"))
  }

  def q71AnomalyDays(spark: SparkSession, dir: String): DataFrame =
    anomalyFrom(dailyCents(Tables.events(spark, dir)))

  /** DuckDB replay: identical cents quantization and the identical
    * square-free integer inequality in HUGEINT (DuckDB's exact wide
    * integer) — bit-exact agreement, no tolerance.
    */
  val q71OracleSql: String =
    """WITH day AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS s,
      |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
      |  FROM day GROUP BY 1)
      |SELECT day.event_type, d, x AS day_cents
      |FROM day JOIN st USING (event_type)
      |WHERE (CAST(x AS HUGEINT) * n - s) > 0
      |  AND (CAST(x AS HUGEINT) * n - s) * (CAST(x AS HUGEINT) * n - s) * (n - 1)
      |      > 4 * n * (n * q - s * s)
      |ORDER BY 1, 2""".stripMargin

  /** q80: MEDIAN ABSOLUTE DEVIATION — the robust dispersion statistic
    * (outliers cannot move it, unlike stddev): per return flag, the
    * discrete median of |cents − median(cents)|, plus the count of
    * rows beyond the 3×MAD robust-outlier fence. Two passes of the
    * shuffle-free histogram-narrowing percentile machinery
    * ([[Percentiles.exactByHistogram]] — no per-group sort ever), the
    * per-group medians broadcast between them; exact integers end to
    * end.
    */
  def q80Mad(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    // ONE scan+cache of the projection feeds both ladders AND the
    // fence count ([[Percentiles.medianMadDiscrete]]): the deviation
    // lane derives its bounds from the median lane's stats and folds
    // |cents - med| lazily per round — no dev column materialization,
    // no second persist, no third scan for the outlier count. All
    // values are integers < 2^53, so the double domain is exact.
    Percentiles.medianMadDiscrete(c, "l_returnflag", "cents", outlierK = 3.0)
      .select(col("l_returnflag"),
        col("med").cast("long").as("med"),
        col("mad").cast("long").as("mad"),
        col("n_outliers"))
      .orderBy(col("l_returnflag"))
  }

  /** q81: TABLE PROFILING — the ANALYZE/data-quality surface every
    * warehouse ships: per column, null count, exact distinct count,
    * lexicographic min/max, and the DETERMINISTIC top value
    * (max-frequency, ties to the smallest value — q67's portable mode,
    * not the engine-defined `mode()`). Values profile as STRINGS
    * (longs render identically cross-engine; doubles/timestamps are
    * deliberately excluded from the gate for that reason).
    *
    * Shape: one `stack` unpivot (rows × |cols|, a projection — no
    * shuffle), then partial-agg groupBys on (col) and (col, value);
    * output is O(|cols|) rows. At 100 TB the (col, value) distinct
    * pass is the honest cost of EXACT distincts — the approx profile
    * rides q59's HLL rule instead.
    */
  def q81Profile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val u = o.select(expr(
      """stack(5,
        |  'cents', CAST(cents AS STRING),
        |  'o_custkey', CAST(o_custkey AS STRING),
        |  'o_orderkey', CAST(o_orderkey AS STRING),
        |  'o_orderpriority', o_orderpriority,
        |  'o_orderstatus', o_orderstatus) AS (colname, val)""".stripMargin))
    val p = u.groupBy(col("colname")).agg(
      (count(lit(1)) - count(col("val"))).as("n_nulls"),
      countDistinct(col("val")).as("n_distinct"),
      min(col("val")).as("min_val"), max(col("val")).as("max_val"))
    val c = u.groupBy(col("colname"), col("val")).agg(count(lit(1)).as("f"))
    val m = c.groupBy(col("colname")).agg(max(col("f")).as("mf"))
    val top = c.join(m, "colname").filter(col("f") === col("mf"))
      .groupBy(col("colname")).agg(min(col("val")).as("top_val"))
    p.join(top, "colname").orderBy(col("colname"))
  }

  /** q82: APPROXIMATE TABLE PROFILING — q81's surface with the
    * exact-distinct pass swapped for HLL++ through the q59 opt-in
    * rewrite rule (a child session enables
    * [[graft.plans.ApproxDistinctRule]]; the unpivoted profile query
    * itself is UNCHANGED — the analyzer swaps the sketch in). This is
    * the honest 100 TB default q81's doc names: per column the
    * distinct profile costs constant mergeable sketch state in ONE
    * partial-agg pass — the exact variant's (col, value) shuffle of
    * the whole unpivot disappears. Gate shape = q59: the EXACT
    * distinct count stays the oracle-checked output; the sketch
    * estimate is proven in-row within 3σ = 15% of it, and the rewrite
    * is plan-proven to have fired.
    */
  def q82ProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    def unpivoted(sp: SparkSession) = Tables.orders(sp, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(expr(
        """stack(5,
          |  'cents', CAST(cents AS STRING),
          |  'o_custkey', CAST(o_custkey AS STRING),
          |  'o_orderkey', CAST(o_orderkey AS STRING),
          |  'o_orderpriority', o_orderpriority,
          |  'o_orderstatus', o_orderstatus) AS (colname, val)""".stripMargin))
    val s2 = spark.newSession()
    s2.conf.set(graft.plans.ApproxDistinctRule.ConfKey, "true")
    val approxDf = unpivoted(s2).groupBy(col("colname"))
      .agg(count_distinct(col("val")).as("approx_nd"))
    val fired = approxDf.queryExecution.analyzed.toString
      .contains("approx_count_distinct")
    val approx = approxDf.collect() // O(|cols|) = 5 rows
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val amap = map(approx.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    unpivoted(spark).groupBy(col("colname")).agg(
      (count(lit(1)) - count(col("val"))).as("n_nulls"),
      countDistinct(col("val")).as("n_distinct"),
      min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      .select(col("colname"), col("n_nulls"), col("n_distinct"),
        col("min_val"), col("max_val"),
        (abs(element_at(amap, col("colname")) - col("n_distinct"))
          <= col("n_distinct") * lit(0.15)).as("within_bound"),
        lit(fired).as("rewrite_fired"))
      .orderBy(col("colname"))
  }

  val q82OracleSql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |u AS (
      |  SELECT 'cents' AS colname, CAST(cents AS VARCHAR) AS val FROM o
      |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM o
      |  UNION ALL SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM o
      |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM o
      |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM o)
      |SELECT colname,
      |  CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
      |  CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
      |  min(val) AS min_val, max(val) AS max_val,
      |  TRUE AS within_bound, TRUE AS rewrite_fired
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  val q81OracleSql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |u AS (
      |  SELECT 'cents' AS colname, CAST(cents AS VARCHAR) AS val FROM o
      |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM o
      |  UNION ALL SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM o
      |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM o
      |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM o),
      |p AS (SELECT colname,
      |    CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
      |    CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
      |    min(val) AS min_val, max(val) AS max_val
      |  FROM u GROUP BY 1),
      |c AS (SELECT colname, val, count(*) AS f FROM u GROUP BY 1, 2),
      |m AS (SELECT colname, max(f) AS mf FROM c GROUP BY 1),
      |t AS (SELECT c.colname, min(c.val) AS top_val
      |  FROM c JOIN m ON c.colname = m.colname WHERE c.f = m.mf
      |  GROUP BY 1)
      |SELECT p.colname, p.n_nulls, p.n_distinct, p.min_val, p.max_val,
      |  t.top_val
      |FROM p JOIN t ON p.colname = t.colname ORDER BY p.colname""".stripMargin

  val q80OracleSql: String =
    """WITH c AS (SELECT l_returnflag AS f,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |m AS (SELECT f, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
      |  FROM c GROUP BY 1),
      |d AS (SELECT c.f, m.med, abs(c.cents - m.med) AS dev
      |  FROM c JOIN m ON c.f = m.f),
      |a AS (SELECT f, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.f AS l_returnflag, max(d.med) AS med, max(a.mad) AS mad,
      |  CAST(count(*) FILTER (WHERE d.dev > 3 * a.mad) AS BIGINT)
      |    AS n_outliers
      |FROM d JOIN a ON d.f = a.f
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
