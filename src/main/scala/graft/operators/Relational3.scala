package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 relational additions: correlated subqueries, IGNORE NULLS
  * window navigation, MERGE-style upsert, and SCD Type-2 history
  * builds.
  *
  * All four stay fully declarative — Catalyst decorrelates the
  * subqueries into semi/anti joins and the upsert/SCD forms are
  * join + window compositions, so every one of them scales as its
  * underlying shuffle does (keyed by custkey — no skew, no global
  * sorts over fact rows; final orderBy is presentation-only on
  * group-sized output).
  */
object Relational3 {

  /** q43: correlated EXISTS / NOT EXISTS — customers who placed at
    * least one urgent order but have no completed ('F') order.
    * Written through the SQL surface to exercise the decorrelation
    * path: Catalyst rewrites EXISTS → left-semi and NOT EXISTS →
    * left-anti, both broadcastable when the inner side aggregates
    * small; at 100 TB both sides shuffle on o_custkey once.
    */
  def q43ExistsSubquery(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)

  /** q46: IGNORE NULLS window navigation — for every order, the price
    * of the same customer's most recent PRIOR completed ('F') order,
    * and that customer's first urgent-order date carried to every row.
    * `lag(..., ignoreNulls = true)` skips the non-F gaps natively
    * (no self-join, no LOCF subpass); the window shards by customer,
    * so no partition exceeds one customer's order history.
    */
  def q46IgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderstatus") === "F", col("o_totalprice")).as("f_price"),
        when(col("o_orderpriority") === "1-URGENT", col("o_orderdate")).as("urgent_d"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(lag(col("f_price"), 1, null, ignoreNulls = true).over(w), 2)
          .as("prev_f_price"),
        first(col("urgent_d"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("first_urgent_date"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q44: MERGE-style upsert — the engine's mutable-table story.
    * Base = each customer's LAST order of 1997 (latest by date, then
    * key); updates = orders from 1998+. Semantics match
    * `MERGE INTO base USING updates ON custkey WHEN MATCHED THEN
    * UPDATE WHEN NOT MATCHED THEN INSERT`, with the newest update row
    * winning per key. Composed as: window-dedup each side to one row
    * per key (shuffle on custkey) → full-outer merge with
    * update-wins coalesce. At 100 TB both sides arrive hash-
    * partitioned on the merge key, so the outer join reuses the
    * dedup's exchange — one shuffle total per side.
    */
  def q44MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def latestPerCust(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    val base = latestPerCust(o.filter(year(col("o_orderdate")) === 1997))
      .select(col("o_custkey").as("b_ck"), col("o_orderkey").as("b_ok"),
        col("o_totalprice").as("b_price"), col("o_orderstatus").as("b_status"))
    val upd = latestPerCust(o.filter(year(col("o_orderdate")) >= 1998))
      .select(col("o_custkey").as("u_ck"), col("o_orderkey").as("u_ok"),
        col("o_totalprice").as("u_price"), col("o_orderstatus").as("u_status"))
    base.join(upd, col("b_ck") === col("u_ck"), "full_outer")
      .select(
        coalesce(col("u_ck"), col("b_ck")).as("o_custkey"),
        coalesce(col("u_ok"), col("b_ok")).as("o_orderkey"),
        round(coalesce(col("u_price"), col("b_price")), 2).as("price"),
        coalesce(col("u_status"), col("b_status")).as("status"),
        when(col("u_ck").isNull, "kept")
          .when(col("b_ck").isNull, "inserted")
          .otherwise("updated").as("merge_action"))
      .orderBy(col("o_custkey"))
  }

  /** q45: SCD Type-2 history build — each customer's order-priority
    * regime as [valid_from, valid_to) ranges: consecutive same-
    * priority runs collapse into one versioned row, the open version
    * ends at NULL. The classic island detection: change-flag → running
    * version number (both over the per-customer window) → one
    * group-by. Everything shards by custkey; version counts are tiny
    * compared to fact rows, so the final agg shrinks the data.
    */
  def q45Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority").as("prio"))
      .withColumn("chg",
        when(lag(col("prio"), 1).over(w).isNull ||
          lag(col("prio"), 1).over(w) =!= col("prio"), 1).otherwise(0))
      .withColumn("version",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("o_custkey"), col("version"), col("prio"))
      .agg(
        min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("o_custkey")).orderBy(col("version"))))
      .select(col("o_custkey"), col("version"), col("prio"),
        col("valid_from"), col("valid_to"), col("n_orders"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** q79: TEMPORAL (fact-to-SCD2) join — every order looked up against
    * the customer's priority REGIME in force 30 days earlier (the
    * "which version of the dimension was true back then" question
    * every warehouse with slowly-changing dimensions asks). The dim is
    * q45's SCD2 history; the lookup is the NATIVE as-of operator
    * (AsOfJoinExec — single shuffle, per-key forward fill, no range
    * self-join). Same-day regime flips stay deterministic because the
    * as-of time is the composite (day × 1000 + version) long — the
    * (valid_from, version) lexicographic order in one integer, exact
    * in both engines. Orders predating the first regime report 'none'.
    */
  def q79TemporalJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = q45Scd2(spark, dir).select(
      col("o_custkey").as("ck"), col("prio"),
      (unix_date(col("valid_from").cast("date")) * 1000 + col("version"))
        .cast("long").as("rt"))
    val fact = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        (unix_date(date_sub(col("o_orderdate").cast("date"), 30)) * 1000 + 999)
          .cast("long").as("t"))
    graft.operators.AsOfJoin.asOfNative(
      left = fact, right = dim,
      leftKey = "o_custkey", rightKey = "ck",
      leftTime = "t", rightTime = "rt",
      payload = Seq("prio"))
      .groupBy(coalesce(col("prio"), lit("none")).as("prio_then"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("prio_then"))
  }

  val q79OracleSql: String =
    """WITH s AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority AS prio,
      |    CASE WHEN lag(o_orderpriority) OVER w IS NULL
      |           OR lag(o_orderpriority) OVER w <> o_orderpriority
      |      THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |v AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS version
      |  FROM s),
      |g AS (
      |  SELECT o_custkey, version, prio,
      |    CAST(min(o_orderdate) AS DATE) AS valid_from
      |  FROM v GROUP BY 1, 2, 3),
      |f AS (SELECT o_orderkey, o_custkey,
      |    CAST(o_orderdate AS DATE) - 30 AS ad FROM orders),
      |j AS (
      |  SELECT f.o_orderkey, g.prio,
      |    row_number() OVER (PARTITION BY f.o_orderkey
      |      ORDER BY g.valid_from DESC, g.version DESC) AS rn
      |  FROM f JOIN g ON f.o_custkey = g.o_custkey AND g.valid_from <= f.ad),
      |m AS (SELECT o_orderkey, prio FROM j WHERE rn = 1)
      |SELECT COALESCE(m.prio, 'none') AS prio_then, count(*) AS n_orders
      |FROM f LEFT JOIN m ON f.o_orderkey = m.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q47: RECURSIVE CTE — iterative plans expressed in SQL (Spark 4's
    * WITH RECURSIVE): the anchor seeds the first order month, each
    * step adds one month to a fixed horizon, and the spine left-joins
    * monthly revenue so empty months surface as zeros. Recursion depth
    * is O(months) — calendar-bounded, independent of fact-table size —
    * while the revenue side stays one partial-agg scan; the join is a
    * broadcast of the tiny spine at any scale.
    */
  def q47RecursiveCte(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) FROM orders
        |  UNION ALL
        |  SELECT add_months(m, 1) FROM months
        |  WHERE m < DATE '2001-08-01'
        |),
        |rev AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |    count(*) AS n,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |      / 100.0 AS rev
        |  FROM orders GROUP BY 1)
        |SELECT date_format(months.m, 'yyyy-MM-dd') AS month,
        |  coalesce(n, 0) AS n, coalesce(rev, 0.0) AS rev
        |FROM months LEFT JOIN rev ON months.m = rev.m
        |ORDER BY month""".stripMargin)

  /** q48: correlated LATERAL subquery — per-customer top-2 orders by
    * price, written as the SQL-standard lateral derived table (the
    * form ORMs and BI tools emit). Catalyst decorrelates the LIMIT
    * into a per-key rank filter, so the plan is the same shuffled
    * window top-k as a hand-written row_number() — no per-row
    * re-execution of the inner query exists at any scale.
    */
  def q48LateralTopN(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price, t.rn
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, rn""".stripMargin)

  /** q50: sliding-window DISTINCT count — distinct users per event type
    * over a trailing 7-day window, for every observed (type, day).
    *
    * COUNT(DISTINCT) OVER a sliding frame is the one window aggregate
    * engines can't stream (per-frame distinct state is O(frame) per
    * row), so the scalable plan re-expresses it relationally: distinct
    * (type, day, user) triples, explode each to the <= 7 window-end
    * days it covers (a constant-factor narrow map), re-distinct, count.
    * Every shuffle keys on high-cardinality (type, day[, user]) — no
    * per-row distinct buffers, no unpartitioned windows, and 7x row
    * amplification happens AFTER the first distinct already collapsed
    * the fact table to at most |users| x |days| x |types|.
    */
  def q50WindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    // du feeds both the spine and the window explode; checkpoint so the
    // events scan + first distinct run once (d13/d17's pattern).
    val du = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
      .localCheckpoint(true)
    val spine = du.select(col("event_type"), col("d")).distinct()
    val covered = du
      .select(col("event_type"), col("user_id"), col("d"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(col("event_type"), date_add(col("d"), col("i")).as("wd"), col("user_id"))
      .distinct()
    val counts = covered.groupBy(col("event_type"), col("wd"))
      .agg(count(lit(1)).as("u7"))
    // Both sides descend from the same checkpointed `du`; explicit
    // aliases keep the join columns unambiguous (without them Spark
    // warns "trivially true equals predicate" and a refactor could
    // silently degrade the join to a cartesian-with-filter).
    spine.alias("sp").join(counts.alias("ct"),
        col("sp.event_type") === col("ct.event_type") && col("sp.d") === col("ct.wd"))
      .select(col("sp.event_type"), col("sp.d"), col("u7"))
      .orderBy(col("event_type"), col("d"))
  }
}
