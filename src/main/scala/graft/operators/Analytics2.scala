package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-analytics batch 2 (SURVEY.md §2): gaps-and-islands
  * streaks and interval-concurrency sweeps — the two classic
  * "sequence analytics over sets" shapes BI workloads ask for that
  * neither plain aggregation nor a single window covers.
  */
object Analytics2 {

  /** q74: GAPS-AND-ISLANDS — longest run of CONSECUTIVE active months
    * per customer, reported as a histogram (longest_streak →
    * n_customers).
    *
    * The island trick: for each customer's sorted distinct active
    * months, `month_index - row_number` is constant exactly within a
    * run of consecutive months, so one window + one groupBy finds
    * every island without self-joins or iteration.
    *
    * Scale: every shuffle is keyed on c_custkey (high cardinality —
    * no skewed window partitions); the month grid is O(active months
    * per customer) ≤ a few hundred rows per key, and the histogram
    * output is O(max streak) rows. Works unchanged at 1000× — the
    * only growth is in the number of customer keys, which is the
    * partitioning dimension.
    */
  def q74Streaks(spark: SparkSession, dir: String): DataFrame = {
    val months = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    months
      .withColumn("isl", col("m") - row_number().over(w))
      .groupBy(col("o_custkey"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey"))
      .agg(max(col("len")).as("longest_streak"))
      .groupBy(col("longest_streak"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("longest_streak"))
  }

  val q74OracleSql: String =
    """WITH months AS (
      |  SELECT DISTINCT o_custkey,
      |    year(o_orderdate) * 12 + month(o_orderdate) AS m
      |  FROM orders),
      |isl AS (
      |  SELECT o_custkey,
      |    m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS isl
      |  FROM months),
      |runs AS (
      |  SELECT o_custkey, count(*) AS len FROM isl GROUP BY o_custkey, isl),
      |longest AS (
      |  SELECT o_custkey, max(len) AS longest_streak FROM runs GROUP BY 1)
      |SELECT longest_streak, count(*) AS n_customers
      |FROM longest GROUP BY 1 ORDER BY 1""".stripMargin

  /** q75: INTERVAL CONCURRENCY (sweep line) — how many orders are
    * simultaneously "active" each day, per order status, where an
    * order is active for 15 days inclusive of its order date
    * (d0..d0+14; the -1 delta lands on d0+15, the day AFTER the
    * window closes — the oracle mirrors the same +15). The classic
    * overlap problem (concurrent sessions, room occupancy, active
    * promotions) solved without a range self-join:
    *
    *   interval → +1 at start, −1 the day AFTER end   (2 rows/order)
    *   groupBy (status, day) sums the deltas           (O(days) rows)
    *   running sum over the day axis = concurrency     (window over
    *                                                    O(days) rows)
    *
    * Scale: the only data-sized pass is the delta projection + its
    * partial-agg groupBy; the sweep itself runs over |status|×|days|
    * pre-aggregated rows. A range self-join (`a.start <= b.end AND
    * ...`) would be O(n × overlap) — this is O(n + days). Days with
    * zero active orders simply don't appear (no deltas, no row).
    */
  def q75ActiveIntervals(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("st"), to_date(col("o_orderdate")).as("d0"))
    val deltas = o.select(col("st"), col("d0").as("d"), lit(1L).as("delta"))
      .unionByName(
        o.select(col("st"), date_add(col("d0"), 15).as("d"), lit(-1L).as("delta")))
      .groupBy(col("st"), col("d"))
      .agg(sum(col("delta")).as("delta"))
    val w = Window.partitionBy(col("st")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("concurrent", sum(col("delta")).over(w))
      // The trailing -1 day of each status ends at 0 concurrency —
      // keep it: it closes the series and the oracle replays it.
      .select(col("st").as("o_orderstatus"), col("d"), col("concurrent"))
      .orderBy(col("o_orderstatus"), col("d"))
  }

  /** q76: TIME-WEIGHTED AVERAGE (TWAP) — the metric a step-function
    * series needs (a reading holds until the next one, so plain AVG
    * over-weights bursts): per (event_type, year), weight each
    * reading's cents by the SECONDS until the next same-type reading
    * (lead over a (ts, event_id)-ordered window; the series' last
    * reading has no successor and drops). All arithmetic is exact
    * integers — cents × gap-seconds summed as BIGINT — with ONE
    * double division at presentation, so the result is bit-identical
    * whatever the aggregation order.
    *
    * Scale: event_type alone is a bounded-cardinality window key (at
    * 100x data each type's entire history would sort in ONE task), so
    * the lead runs per (event_type, DAY) — parallelism grows with the
    * calendar — and each day's LAST reading gets its successor from a
    * broadcast stitch table: per-bucket first timestamps (|types| x
    * |days| rows, metadata-sized) lead-shifted one bucket over a
    * spine-only window. coalesce(in-bucket lead, stitched boundary)
    * reproduces the global per-type ordering exactly; only the
    * series' true last reading drops, as before.
    */
  def q76Twap(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_type"), col("ts"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
      .withColumn("bkt", to_date(col("ts")))
    val wb = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("ts"), col("event_id"))
    // Per-bucket first reading; min(struct) ranks (ts, event_id)
    // lexicographically — identical to the window's sort key.
    val wSpine = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
    val nextFirsts = e.groupBy(col("event_type"), col("bkt"))
      .agg(min(struct(col("ts"), col("event_id"))).getField("ts").as("first_ts"))
      .withColumn("next_first_ts", lead(col("first_ts"), 1).over(wSpine))
      .select(col("event_type"), col("bkt"), col("next_first_ts"))
    e.withColumn("next_ts", lead(col("ts"), 1).over(wb))
      .join(broadcast(nextFirsts), Seq("event_type", "bkt"), "left")
      .withColumn("succ_ts", coalesce(col("next_ts"), col("next_first_ts")))
      .filter(col("succ_ts").isNotNull)
      .withColumn("gap",
        unix_timestamp(col("succ_ts")) - unix_timestamp(col("ts")))
      .groupBy(col("event_type"), year(col("ts")).as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents") * col("gap")).as("ws"),
        sum(col("gap")).as("wt"))
      .select(col("event_type"), col("y"), col("n"),
        (col("ws").cast("double") / col("wt") / 100.0).as("twap"))
      .orderBy(col("event_type"), col("y"))
  }

  val q76OracleSql: String =
    """WITH e AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
      |      - CAST(floor(epoch(ts)) AS BIGINT) AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
      |SELECT event_type, CAST(year(ts) AS INT) AS y, count(*) AS n,
      |  CAST(sum(cents * gap) AS DOUBLE) / CAST(sum(gap) AS BIGINT) / 100.0
      |    AS twap
      |FROM e WHERE gap IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q77: SESSION TRANSITION MATRIX — the first-order Markov view of
    * user journeys (the "what follows an error?" question): per user,
    * consecutive events ≤30 min apart form a transition
    * (from_type → to_type); counts aggregate globally and each row
    * carries its share of the from-type's outgoing transitions.
    *
    * Scale: the window partitions on user_id (high cardinality); the
    * transition table is O(|types|²) rows, so the share window is
    * metadata-sized. Exact integer counts; one double division per
    * output row computed from identical longs in both engines.
    */
  def q77Transitions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val shares = Window.partitionBy(col("from_type"))
    e.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_s",
        unix_timestamp(lead(col("ts"), 1).over(w)) - unix_timestamp(col("ts")))
      .filter(col("to_type").isNotNull && col("gap_s") <= 1800)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pct",
        round(col("n").cast("double") * 100.0 / sum(col("n")).over(shares), 4))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q77OracleSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    lead(event_type) OVER w AS to_type,
      |    CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
      |      - CAST(floor(epoch(ts)) AS BIGINT) AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT event_type AS from_type, to_type, count(*) AS n
      |  FROM s WHERE to_type IS NOT NULL AND gap_s <= 1800
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) * 100.0
      |    / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT), 4) AS pct
      |FROM t ORDER BY from_type, to_type""".stripMargin

  val q75OracleSql: String =
    """WITH o AS (
      |  SELECT o_orderstatus AS st, CAST(o_orderdate AS DATE) AS d0 FROM orders),
      |deltas AS (
      |  SELECT st, d, CAST(sum(delta) AS BIGINT) AS delta FROM (
      |    SELECT st, d0 AS d, 1 AS delta FROM o
      |    UNION ALL
      |    SELECT st, d0 + 15, -1 FROM o)
      |  GROUP BY st, d)
      |SELECT st AS o_orderstatus, d,
      |  CAST(sum(delta) OVER (PARTITION BY st ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS concurrent
      |FROM deltas
      |ORDER BY o_orderstatus, d""".stripMargin

  /** q78: PARETO / CONCENTRATION REPORT — customers ranked by total
    * revenue and bucketed into revenue-rank deciles; each decile's
    * customer count, exact cents, revenue share, and cumulative share
    * (the 80/20 question: how concentrated is revenue?).
    *
    * Scale: per-customer revenue is a partial-agg groupBy; the global
    * revenue ranking uses [[Ranks.withGlobalIndex]] (range-partition +
    * local sort — NO single-task window sort); decile assignment is
    * pure integer arithmetic off the index ((idx*10) div n — exact,
    * no double round-trip); the only window runs over the 10-row
    * decile spine. Shares are ONE double division at presentation.
    */
  def q78Pareto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .select(col("o_custkey"), col("cents")).as[(Long, Long)]
      .map(identity).toDF("o_custkey", "cents") // non-null long for Ranks
    val tot = rev.agg(count(lit(1)).as("n_cust"),
      sum(col("cents")).as("tot")).localCheckpoint(true)
    val deciles = graft.operators.Ranks
      .withGlobalIndex(rev, Seq(col("cents").desc, col("o_custkey")), "__idx")
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("CAST((__idx * 10) div n_cust AS INT) + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .crossJoin(broadcast(tot.select(col("tot"))))
      .withColumn("share", round(col("cents").cast("double") / col("tot"), 6))
      .withColumn("cum_share",
        round(sum(col("cents")).over(w).cast("double") / col("tot"), 6))
      .select(col("decile"), col("n_customers"), col("cents"),
        col("share"), col("cum_share"))
      .orderBy(col("decile"))
  }

  val q78OracleSql: String =
    """WITH r AS (SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |i AS (SELECT o_custkey, cents,
      |    row_number() OVER (ORDER BY cents DESC, o_custkey) - 1 AS idx
      |  FROM r),
      |t AS (SELECT count(*) AS n_cust, CAST(sum(cents) AS BIGINT) AS tot
      |  FROM r),
      |d AS (SELECT CAST((idx * 10) // n_cust AS INT) + 1 AS decile,
      |    count(*) AS n_customers, CAST(sum(cents) AS BIGINT) AS cents
      |  FROM i CROSS JOIN t GROUP BY 1)
      |SELECT decile, n_customers, cents,
      |  round(CAST(cents AS DOUBLE) / tot, 6) AS share,
      |  round(CAST(sum(cents) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / tot, 6) AS cum_share
      |FROM d CROSS JOIN t ORDER BY decile""".stripMargin
}
