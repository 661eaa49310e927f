package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second batch of relational query shapes (SURVEY.md §2: q23..q31). */
object Relational2 {

  /** q23: correlated scalar subquery — customers above their nation's
    * average balance. Expressed as agg + broadcast-join (what a
    * decorrelation rule produces anyway; one pass, no per-row subquery).
    */
  def q23ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.groupBy(col("c_nationkey").as("nk"))
      .agg(avg(col("c_acctbal")).as("nation_avg"))
    c.join(broadcast(avgBal), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** q24: CUBE — all subtotal combinations over (region, segment). */
  def q24Cube(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      // Exact cents (see q01) — cube grand totals drift first.
      .agg(count(lit(1)).as("n_cust"),
        (sum(round(col("c_acctbal") * 100).cast("long")) / 100.0).as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("c_mktsegment"))
  }

  /** q25: explode/unnest — corpus-wide word frequencies, top 20. */
  def q25ExplodeWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(20)

  /** q26: string function suite over a dimension. */
  def q26StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(
        col("n_nationkey"),
        upper(col("n_name")).as("u"),
        lower(col("n_name")).as("l"),
        substring(col("n_name"), 1, 3).as("pre"),
        length(col("n_name")).as("len"),
        concat(col("n_name"), lit("-"), col("n_regionkey").cast("string")).as("ck"))
      .orderBy(col("n_nationkey"))

  /** q27: date/time function suite. */
  def q27DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  /** q28: null-handling semantics — coalesce / nullif / case bands. */
  def q28NullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("band"))
      .orderBy(col("c_custkey"))

  /** q29: analytic distribution windows — percent_rank / cume_dist per
    * segment (deterministic via unique order key).
    *
    * NOT a window partitioned by c_mktsegment: ~5 segment values means
    * each window partition is 20% of the table sorted in ONE task — a
    * skewed single-task sort at scale. Instead: range-partition on
    * (segment, acctbal, custkey) so each segment spreads over many
    * contiguous partitions, two-pass global rank via zipWithIndex, and
    * broadcast per-segment counts/offsets (|segments| rows). Within-
    * segment rank = global rank - segment offset; percent_rank and
    * cume_dist are then pure arithmetic. The ordering key is unique, so
    * rank == row_number and cume_dist == rn/n — the same values the
    * window functions produce.
    */
  def q29WindowPct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    // Tiny: one row per segment. Sorted lexicographically — ASCII
    // segment names make JVM string order equal the range partitioner's
    // UTF8 binary order, so cumulative counts are exactly each
    // segment's global-rank offset (see Ranks scaladoc).
    val segCounts = cust.groupBy(col("c_mktsegment")).count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = segCounts.scanLeft(0L)(_ + _._2).init
    val segStats = segCounts.zip(offsets)
      .map { case ((seg, cnt), off) => (seg, cnt, off) }.toSeq
      .toDF("c_mktsegment", "__cnt", "__off")

    val rn = col("__idx") - col("__off") + 1
    Ranks.withGlobalIndex(
      cust, Seq(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")), "__idx")
      .join(broadcast(segStats), "c_mktsegment")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        round(when(col("__cnt") <= 1, 0.0)
          .otherwise((rn - 1) / (col("__cnt") - 1)), 6).as("pct_rank"),
        round(rn / col("__cnt"), 6).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** q30: first/last/nth value over the full per-nation ordering
    * (acctbal DESC, custkey ASC). A full-frame window on 25-value
    * c_nationkey would sort the SF-growing customer table in 25
    * tasks; instead ONE partial-agg pass computes the per-nation
    * extremes — TopKByScore(k=2) for richest + second (same
    * tie-break as the window), max(struct(-bal, key)) for the
    * ordering's LAST row — and the 25-row table broadcast-joins back
    * onto every customer row.
    */
  def q30FirstLast(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val per = c.groupBy(col("c_nationkey"))
      .agg(
        graft.functions.VectorFunctions
          .topKByScore(col("c_acctbal"), col("c_custkey"), 2).as("tk"),
        max(struct((-col("c_acctbal")).as("nb"), col("c_custkey").as("k"))).as("worst"))
      .select(
        col("c_nationkey"),
        col("tk").getItem(0).getField("id").as("richest"),
        col("worst").getField("k").as("poorest"),
        when(size(col("tk")) >= 2, col("tk").getItem(1).getField("id")).as("second"))
    c.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(per), "c_nationkey")
      .select(col("c_custkey"), col("c_nationkey"),
        col("richest"), col("poorest"), col("second"))
      .orderBy(col("c_custkey"))
  }

  /** q32: INTERSECT — nation keys present among both customers and
    * suppliers (plans as a distinct + semi join).
    */
  def q32Intersect(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk"))
    c.intersect(s).orderBy(col("nk"))
  }

  /** q33: EXCEPT — nation keys with customers but no suppliers. */
  def q33Except(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk"))
    c.except(s).orderBy(col("nk"))
  }

  /** q34: exact continuous percentiles (median / p90) per group.
    *
    * NOT the built-in exact `percentile` aggregate: that holds a
    * value->count map per group in one task — O(distinct values) state,
    * which for high-cardinality columns (prices) is an O(rows) buffer
    * at 100 TB. [[Percentiles.exactByHistogram]] computes the same
    * type-7 order statistics via iterative histogram narrowing: no data
    * shuffle at all, only O(buckets) aggregate rows per pass (the
    * rank-shuffle form, [[Percentiles.exactByRank]], is kept for
    * callers needing full rank assignment).
    */
  def q34Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // BOTH columns' ladders run in ONE fused loop (one cached
    // projection, one stats job, one histogram job per round) — half
    // the passes of two independent calls, same exact order statistics.
    Percentiles.exactByHistogramMulti(li, "l_returnflag", Seq(
      Percentiles.HistSpec("l_quantity", Seq(0.5, 0.9), Seq("mq", "pq")),
      Percentiles.HistSpec("l_extendedprice", Seq(0.5), Seq("mp"))))
      .select(
        col("l_returnflag"),
        round(col("mq"), 4).as("median_qty"),
        round(col("pq"), 4).as("p90_qty"),
        round(col("mp"), 4).as("median_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q35: LIKE / string-predicate filter (pushes as StringContains). */
  def q35Like(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%bolt%") || col("p_type").like("STANDARD%"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))

  /** q36: RANGE-interval window frame (date-distance, not row-count —
    * calendar gaps matter). Expressed through the engine's SQL surface
    * to exercise GraftSession in the correctness gate.
    */
  def q36RangeFrame(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT d, rev_cents,
        |  CAST(sum(rev_cents) OVER (ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS w7_cents
        |FROM daily ORDER BY d""".stripMargin)

  /** q37: ordered string aggregation (listagg / string_agg). */
  def q37ListAgg(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT r_name,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin)

  /** q31: time-range join — purchases within ±30 min of each error
    * event by the same user. The user_id equi-key carries the shuffle;
    * the range predicate applies post-join (sort-merge, no
    * nested-loop explosion). Without an equi key, bucketize time and
    * equi-join on (bucket, neighbor buckets) instead.
    */
  def q31RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_err"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("t_pur"))
    errors
      .join(purchases,
        col("user_id") === col("p_user") &&
          abs(col("t_err") - col("t_pur")) <= 1800L * 1000000L,
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("t_pur")).as("n_nearby"))
      .orderBy(col("event_id"))
  }

  /** q41: calendar gap-fill — build the full (status x day) date spine,
    * left-join the daily revenue series, and carry the last observation
    * forward over the gaps with an IGNORE NULLS window (LOCF, the
    * standard time-series repair for reporting dashboards). Days before
    * a status's first observation stay null.
    *
    * The window partitions by the low-cardinality status — safe ONLY
    * because its input is the pre-aggregated |days| x |statuses| grid
    * (thousands of rows at any corpus size), the same category as
    * q07/q08's day-series windows, never raw fact rows.
    */
  def q41GapFill(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val daily = o.groupBy(col("o_orderstatus"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
    val spine = o
      .agg(to_date(min(col("o_orderdate"))).as("lo"), to_date(max(col("o_orderdate"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    val grid = spine.crossJoin(o.select(col("o_orderstatus")).distinct())
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("o_orderstatus", "d"), "left")
      .select(
        col("o_orderstatus"), col("d"), col("rev_cents"),
        last(col("rev_cents"), ignoreNulls = true).over(w).as("filled_cents"))
      .orderBy(col("o_orderstatus"), col("d"))
  }

  /** q42: FULL OUTER join — per-nation customer vs supplier presence,
    * keeping nations that appear on either side only. Plans as a
    * sort-merge full outer (no broadcast form exists for full outer);
    * both sides are pre-aggregated to |nation| rows before the join,
    * so the shuffle carries group-sized data.
    */
  def q42FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** q38: per-nation balance quantiles via the mergeable KLL-style
    * sketch aggregate ([[graft.plans.QuantileSketch]]): map-side
    * partial merge, O(capacity) state per group instead of the O(rows)
    * buffer exact `percentile` keeps. Group sizes at the tested SFs sit
    * below capacity, so outputs are EXACT type-7 order statistics —
    * what the oracle hash-checks; the beyond-capacity regime's rank
    * error is spec-bounded (SketchSpec).
    */
  /** q40: GROUPING SETS — an explicit subtotal lattice that is neither
    * a rollup prefix chain nor the full cube: per-status totals,
    * per-priority totals, and the grand total, disambiguated by
    * grouping() markers (a NULL group value vs a subtotal row).
    * Through the SQL surface; plans as a single Expand + partial agg.
    */
  def q40GroupingSets(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS rev,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)

  def q38SketchQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        graft.functions.VectorFunctions
          .quantileSketch(col("c_acctbal"), Seq(0.5, 0.9)).as("qs"),
        count(lit(1)).as("n"))
      .select(
        col("c_nationkey"),
        round(element_at(col("qs"), 1), 4).as("med_bal"),
        round(element_at(col("qs"), 2), 4).as("p90_bal"),
        col("n"))
      .orderBy(col("c_nationkey"))
}
