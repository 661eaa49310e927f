package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 additions, second wave: sketch-backed heavy hitters, the
  * UNPIVOT/melt surface, FILTER-clause aggregates, and a typed cogroup
  * reconciliation — each a distinct API surface a reference user would
  * reach for, each planned as partial aggregates over high-cardinality
  * keys.
  */
object Relational4 {

  /** Heavy-hitter capacity for q52 — comfortably above the corpus's
    * per-type distinct-user count at every SF, so the gate runs the
    * sketch in its EXACT regime (the spec exercises the lossy regime).
    */
  val HeavyHitterCapacity = 4096

  /** q52: top-5 users per event type via the SpaceSaving aggregate
    * ([[graft.plans.FrequentItems]]). The plan is ONE partial-merge
    * aggregation: each scan task reduces to O(capacity) entries before
    * the shuffle, so shuffle bytes are O(partitions x capacity) —
    * independent of both row count AND user cardinality. The groupBy +
    * count + row_number alternative shuffles every (type, user) pair;
    * at 100 TB with high-cardinality keys the sketch is the only shape
    * whose state doesn't grow with the data.
    */
  def q52HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.VectorFunctions.heavyHitters(
        col("user_id").cast("string"), 5, HeavyHitterCapacity).as("hh"))
      .select(col("event_type"), posexplode(col("hh")))
      .select(
        col("event_type"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.item").as("user_id"),
        col("col.cnt").as("cnt"))
      .orderBy(col("event_type"), col("rnk"))

  /** q53: UNPIVOT (melt) — the wide-to-long reshape every BI export
    * needs. The wide frame is a FILTER-style conditional aggregate per
    * year; `Dataset.unpivot` then emits one (metric, value) row per
    * measure column. Unpivot is a narrow projection (no shuffle): rows
    * multiply by |metrics|, a constant.
    */
  def q53Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
        count(when(col("o_orderstatus") === "F", 1)).as("completed"),
        count(lit(1)).as("total"))
    wide.unpivot(
        Array(col("o_year")),
        Array(col("urgent"), col("completed"), col("total")),
        "metric", "value")
      .orderBy(col("o_year"), col("metric"))
  }

  /** q54: FILTER-clause aggregates — the SQL-standard form of
    * conditional aggregation (one scan, many differently-filtered
    * aggregates; the ANSI spelling of q14's CASE trick). Identical SQL
    * runs on both engines through the SQL surface.
    */
  def q54FilterAgg(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT o_orderstatus,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    FILTER (WHERE year(o_orderdate) >= 1998) AS DOUBLE) / 100.0 AS rev_late,
        |  round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
        |    / (count(*) FILTER (WHERE o_orderpriority = '1-URGENT'))
        |    / 100.0, 2) AS avg_urgent
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)

  /** q55: typed COGROUP reconciliation — per-order comparison of the
    * order header total against the sum of its line items, including
    * orders with NO line items (the rows an inner-join agg silently
    * drops). `KeyValueGroupedDataset.cogroup` is the Dataset surface
    * for "both sides of a key at once" logic; it shuffles each side
    * once on the key, exactly like the join it generalizes.
    *
    * Money stays integer cents per line (round-then-sum), so the
    * reconciliation decision replays bit-exactly in any engine —
    * float-sum-then-round would be summation-order-dependent.
    */
  def q55CogroupReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .as[(Long, Double)]
    val rec = orders.groupByKey(_._1).cogroup(lines.groupByKey(_._1)) {
      (key, os, ls) =>
        val oList = os.toSeq
        if (oList.isEmpty) Iterator.empty // line items with no header: none in this corpus
        else {
          val totalCents = math.round(oList.head._2 * 100)
          var nLines = 0
          var lineCents = 0L
          ls.foreach { l => nLines += 1; lineCents += math.round(l._2 * 100) }
          val diff = math.abs(totalCents - lineCents)
          val status =
            if (nLines == 0) "no_lines"
            else if (diff * 100L <= totalCents) "within_1pct"
            else "off"
          Iterator((key, status, diff))
        }
    }
    rec.toDF("o_orderkey", "status", "diff_cents")
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("diff_cents")).as("sum_diff_cents"))
      .orderBy(col("status"))
  }

  /** q58: NOT IN with a NULLABLE subquery — SQL's three-valued trap
    * (one NULL in the list and NOT IN returns nothing), which forces
    * the planner into a NULL-AWARE anti join instead of the plain anti
    * join a NOT EXISTS gets. The CASE keeps the subquery column
    * nullable so the static non-null shortcut is unavailable; the
    * planted-null behavior (empty result) is spec-asserted. Identical
    * SQL runs on both engines.
    */
  def q58NotIn(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir,
      """SELECT c_custkey, c_nationkey
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_totalprice < 0 THEN NULL ELSE o_custkey END
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)

  /** q57: multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    * DUPLICATE multiplicities (min(m₁,m₂) and m₁−m₂ respectively),
    * the semantics q32/q33's DISTINCT forms erase. Per customer: how
    * many of their urgent orders pair off against completed orders
    * (bag intersection) and how many urgent orders exceed that
    * (bag difference). Both plan as multiplicity-counting aggregates +
    * one shuffle on the key — never a row-by-row matching.
    */
  def q57MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val done = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    val inter = urgent.intersectAll(done)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_common"))
    val extra = urgent.exceptAll(done)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_extra"))
    inter.join(extra, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_extra"), lit(0L)).as("n_extra"))
      .orderBy("o_custkey")
  }
}
