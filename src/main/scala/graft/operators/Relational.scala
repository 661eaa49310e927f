package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational query shapes (SURVEY.md §2, q01..q22).
  *
  * Every query:
  *  - is pure DataFrame API (Catalyst optimizes pushdown/pruning/join
  *    strategy; no RDDs, no UDFs),
  *  - aggregates rounded so the driver's DuckDB hash-compare is
  *    float-stable,
  *  - ends in a deterministic total ORDER BY (unique key suffix).
  *
  * Scale notes are per-query where non-obvious.
  */
object Relational {

  private def r2(c: Column): Column = round(c, 2)
  private def r4(c: Column): Column = round(c, 4)

  /** q01: scan→filter→groupBy multi-aggregate (TPC-H Q1 shape).
    * Partial aggregation (map-side combine) + tiny group cardinality:
    * shuffle carries only |flags|x|status| rows per partition.
    */
  def q01AggPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // Plain timestamp comparison (not to_date(col) <= d): a cast on
      // the column would block parquet predicate pushdown.
      .filter(col("l_shipdate") < lit("2001-07-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // Money sums run in EXACT integer cents (per-row round-to-cent,
      // BIGINT sum, present /100.0): a double sum at 1e11 magnitude is
      // ORDER-DEPENDENT (ULP ~6e-5 × millions of adds crosses the
      // 2-decimal rounding boundary), so Spark's shuffle order vs the
      // oracle's scan order diverge at 10× scale. Quantity sums stay
      // double: integer-valued terms add exactly below 2^53.
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")) / 100.0).as("sum_disc_price"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q02: filter + projection — both must reach the parquet scan
    * (PushedFilters + pruned ReadSchema).
    */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 48.0 && col("l_discount") <= 0.02)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q03: global top-N. Spark plans TakeOrderedAndProject: per-partition
    * heap + driver merge of N rows — no global sort at scale.
    */
  def q03TopN(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** q04: 5-way star join. nation/region are broadcast (tiny dims);
    * customer⋈orders⋈lineitem shuffle on their keys; AQE may convert
    * customer side to broadcast at small SF.
    */
  def q04JoinStar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        // Exact cents (see q01): order-independent at any scale.
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")) / 100.0).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** q05: per-group exact distinct count (expands to two-phase agg). */
  def q05CountDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("n_buyers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** q06: top-3 customers per nation by balance. A
    * `row_number() OVER (PARTITION BY c_nationkey ...)` plan would
    * funnel the whole SF-growing customer table through |nations|=25
    * window partitions, so instead the map-side-partial TopKByScore
    * aggregate reduces each scan partition to ≤3 pairs BEFORE the
    * shuffle (same (score DESC, id ASC) tie-break as the window), and
    * the 75-row winner set broadcast-joins back to recover the exact
    * balance and the rank.
    */
  def q06WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val top = c.groupBy(col("c_nationkey"))
      .agg(graft.functions.VectorFunctions
        .topKByScore(col("c_acctbal"), col("c_custkey"), 3).as("tk"))
      .select(col("c_nationkey"), posexplode(col("tk")))
      .select(col("c_nationkey"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("c_custkey"))
    c.select(col("c_custkey"), col("c_acctbal"))
      .join(broadcast(top), "c_custkey")
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("rnk"), col("c_custkey"), r2(col("c_acctbal")).as("acctbal"))
      .orderBy(col("n_name"), col("rnk"))
  }

  /** Daily order revenue in exact integer cents — shared by q07/q08.
    * Integer cents make downstream window math bit-exact vs the oracle.
    */
  private def dailyRevenueCents(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))

  /** q07: 7-day moving average over the daily series (COVID MA analog).
    * The window input is already aggregated to |days| rows — cheap even
    * at 100 TB of raw fact data.
    */
  def q07MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
    dailyRevenueCents(spark, dir)
      .withColumn("ma7_cents", round(avg(col("rev_cents")).over(w), 0).cast("long"))
      .orderBy(col("d"))
  }

  /** q08: cumulative (running) total — cumulative-cases analog. */
  def q08Cumulative(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)
    dailyRevenueCents(spark, dir)
      .withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .orderBy(col("d"))
  }

  /** q09: day-over-day delta + growth %% via lag (daily-growth analog). */
  def q09GrowthRate(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("d"))
    daily
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - col("prev_n"))
      .withColumn("growth_pct",
        r4(col("delta").cast("double") * 100.0 / col("prev_n")))
      .orderBy(col("d"))
  }

  /** q10: pivot matrix via conditional aggregation (exact int counts). */
  def q10Pivot(spark: SparkSession, dir: String): DataFrame = {
    def cnt(prio: String) =
      sum(when(col("o_orderpriority") === prio, 1L).otherwise(0L))
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        cnt("1-URGENT").as("n_urgent"),
        cnt("2-HIGH").as("n_high"),
        cnt("3-MEDIUM").as("n_medium"),
        cnt("4-NOT SPECIFIED").as("n_notspec"),
        cnt("5-LOW").as("n_low"))
      .orderBy(col("o_orderstatus"))
  }

  /** q11: ROLLUP subtotals + grand total over the dim hierarchy. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      // Exact cents (see q01) — the rollup grand total is the largest
      // magnitude any balance sum reaches, i.e. the first to drift.
      .agg(count(lit(1)).as("n_cust"),
        (sum(round(col("c_acctbal") * 100).cast("long")) / 100.0).as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q12: anti join — customers with no orders. */
  def q12AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q13: UNION ALL + distinct across two sources. */
  def q13UnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk"))
    c.union(s).distinct().orderBy(col("nk"))
  }

  /** q14: conditional ratio aggregate per brand (death-rate / TPC-H Q14
    * analog). part is dim-sized → broadcast.
    */
  def q14RatioMetric(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = broadcast(Tables.part(spark, dir))
    // Exact cents (see q01); the pct ratio divides two exact BIGINT
    // sums cast to double — deterministic whatever the add order.
    val revC = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        r4(sum(when(col("p_type") === "ECONOMY", revC).otherwise(lit(0L)))
          .cast("double") * 100.0 / sum(revC).cast("double")).as("economy_pct"),
        (sum(revC) / 100.0).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** q15: HAVING — post-aggregation group filter. */
  def q15Having(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .filter(col("sum_qty") > 300.0)
      .orderBy(col("l_partkey"))

  /** q16: semi join / EXISTS — orders having a near-max-quantity line. */
  def q16SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val big = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49.0)
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_orderkey"))
  }

  /** q17: statistical aggregates (sampled stddev/variance/corr/covar). */
  def q17Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
        r4(var_samp(col("l_quantity"))).as("var_qty"),
        r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
        r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_qty_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** q18: ntile percentile banding over a deterministic total order.
    *
    * NOT `ntile(4) over (order by ...)`: an unpartitioned window drags
    * the whole table into one task — the textbook scale-killer. Instead
    * a distributed two-pass rank: range-partition on the sort key (each
    * partition holds a contiguous key range), sort within partitions,
    * then zipWithIndex (pass 1 counts per-partition rows, pass 2 adds
    * the partition offset — no single-task sort anywhere). The global
    * rank feeds SQL-standard ntile bucket math, then a partial-agg
    * rollup. Scales linearly with partitions at any corpus size.
    */
  def q18Ntile(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_acctbal"), col("c_custkey"))
    val n = cust.count()
    val q = n / 4
    val rem = n % 4
    // SQL ntile(4): first (n%4) buckets take ceil(n/4) rows. Index is
    // non-negative, so cast-truncating the division == floor division.
    def fdiv(a: Column, b: Long): Column = (a / lit(b)).cast("long")
    val idx = col("__idx")
    val quartile =
      when(idx < rem * (q + 1), fdiv(idx, q + 1) + 1)
        .otherwise(lit(rem) + fdiv(idx - rem * (q + 1), math.max(q, 1)) + 1)
        .cast("int")
    Ranks.withGlobalIndex(cust, Seq(col("c_acctbal"), col("c_custkey")), "__idx")
      .withColumn("quartile", quartile)
      .groupBy(col("quartile"))
      .agg(
        count(lit(1)).as("n"),
        r2(min(col("c_acctbal"))).as("lo"),
        r2(max(col("c_acctbal"))).as("hi"))
      .orderBy(col("quartile"))
  }

  /** q19: per-day per-type event rollup (daily-cases analog). */
  def q19EventsDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy(col("d"), col("event_type"))

  /** q20: sessionization by 30-minute inactivity gap, via lag + running
    * sum — one shuffle on user_id; all window math partition-local.
    */
  def q20Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("is_new",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("is_new")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** q21: semi-structured extraction from the JSON props column.
    * regexp (not a JSON parser) so it stays inside codegen; the same
    * approach at scale avoids per-row JSON object allocation.
    */
  def q21JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** q22: as-of join — for each purchase event, the latest order of that
    * user at or before the event time. Uses the native custom-operator
    * form ([[graft.plans.AsOfJoinExec]], ~1.7x the union/window
    * implementation); both forms are property-tested equal.
    */
  def q22AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // Dedupe right side to one row per (key, time) so the as-of pick is
    // deterministic: keep max o_orderkey per (custkey, orderdate).
    val ordersDedup = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    AsOfJoin.asOfNative(
      left = purchases, right = ordersDedup,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"))
      .orderBy(col("event_id"))
  }
}
