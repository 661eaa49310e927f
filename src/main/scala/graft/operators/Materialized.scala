package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental materialized-view maintenance for algebraic aggregates
  * (SURVEY.md §2: mv01).
  *
  * The view is the partial-aggregate state itself (count + raw sum per
  * group): refreshing with an insert-only delta merges the delta's
  * partial aggregate into the maintained state by addition — cost is
  * O(|delta| + |view|), never a recompute over the base. This is the
  * classic algebraic-MV algebra (sum/count/min/max merge; avg derives
  * as sum/count at read time), the same shape Spark itself uses for
  * two-phase aggregation — applied across refreshes instead of across
  * partitions. At 100 TB the base is petabyte-scale parquet and the
  * delta a daily partition; the refresh touches only the delta and the
  * group-count-sized view.
  */
object Materialized {

  /** Partial-aggregate state of one batch: (year, status) -> count,
    * EXACT integer-cent revenue sum. Integer state makes the merge
    * bit-identical with a full recompute whatever the fold order —
    * double partial sums drift with merge order once group totals
    * reach 1e10+. Presentation divides back to dollars at read time.
    */
  def partialState(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_raw"))

  /** Merge an insert-only delta into the maintained view state. */
  def mergeDelta(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(partialState(delta))
      .groupBy(col("o_year"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n"), sum(col("rev_raw")).as("rev_raw"))

  /** Read-time presentation of the view state. */
  def present(view: DataFrame): DataFrame =
    view.select(
      col("o_year"), col("o_orderstatus"), col("n"),
      (col("rev_raw") / 100.0).as("rev"))
      .orderBy(col("o_year"), col("o_orderstatus"))

  /** mv01: build the view on all years before the newest, then apply
    * the newest year's orders as two incremental refresh batches
    * (H1, H2). The horizon is derived from the data (max year), and
    * null order dates stay in the base, so every row lands in exactly
    * one batch regardless of the corpus's time span. The oracle is the
    * full recompute over all orders — equality shows the refresh
    * algebra loses nothing across repeated merges.
    */
  def mv01IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val y = year(col("o_orderdate"))
    // max(year) is null on an empty table or all-null order dates; then
    // there is no delta horizon and the view is just the base state.
    val maxRow = orders.agg(max(y)).collect().head
    if (maxRow.isNullAt(0)) return present(partialState(orders))
    val maxYear = maxRow.getInt(0)
    val base = orders.filter(y.isNull || y < maxYear)
    val h1 = orders.filter(y === maxYear && month(col("o_orderdate")) <= 6)
    val h2 = orders.filter(y === maxYear && month(col("o_orderdate")) > 6)
    present(mergeDelta(mergeDelta(partialState(base), h1), h2))
  }

  /** mv03: the STREAMING refresh loop, gated — an insert-only order
    * stream drives `foreachBatch`, and every micro-batch folds into the
    * maintained view with the SAME [[mergeDelta]] algebra the batch
    * path uses (foreachBatch is batchId-keyed, so a replayed batch can
    * be skipped idempotently in production). The oracle is the full
    * recompute over all orders: equality proves streaming deltas lose
    * nothing vs the batch view.
    *
    * The drive is a parquet FILE-SOURCE stream (the gate has no
    * Kafka): each delta batch — a deterministic pmod(o_orderkey, 3)
    * third of the orders — is staged executor-side as parquet into the
    * stream's input directory, then `processAllAvailable()` folds it
    * in as one micro-batch. Nothing but the group-count-sized view
    * state ever reaches the driver, so the gated path itself is the
    * 100 TB path: stage a delta partition, let the file source pick it
    * up, fold O(|delta| + |view|).
    */
  def mv03StreamRefresh(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    if (orders.isEmpty) return present(partialState(orders))

    val base = java.nio.file.Files.createTempDirectory("graft-mv03")
    // The file source lists the input path at stream start — it must
    // exist (empty is fine) before readStream resolves.
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val ckDir = base.resolve("ck").toString
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val q = spark.readStream.schema(orders.schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        // localCheckpoint pins the micro-batch's rows (the batch
        // DataFrame is only valid inside this callback) and truncates
        // the fold's lineage growth across refreshes.
        val d = delta.localCheckpoint(true)
        state.getAndUpdate {
          case null => partialState(d)
          case v => mergeDelta(v, d).localCheckpoint(true)
        }
        ()
      }
      .outputMode("append").start()
    try {
      // Stage one delta file-set per refresh; each appears to the file
      // source as exactly one new micro-batch.
      graft.streaming.Staging.stageBatches(orders,
        pmod(col("o_orderkey"), lit(3)), 3, inDir) { _ =>
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      // Best-effort cleanup of the staged deltas + checkpoint.
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    present(state.get())
  }

  /** Partial-aggregate state of a JOIN view batch: order deltas joined
    * against the (slowly-changing, here static) customer dimension,
    * aggregated to (mktsegment, orderstatus). The join distributes over
    * insert-only fact deltas — ΔV = agg(ΔO ⋈ C) — so each refresh
    * joins ONLY the delta against the dimension, never re-touching the
    * base fact table. At 100 TB the dimension side broadcasts and the
    * refresh cost is O(|delta|).
    */
  def partialJoinState(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select(
        col("c_custkey").as("o_custkey"), col("c_mktsegment"))), "o_custkey")
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_raw"))

  private def mergeJoinDelta(view: DataFrame, delta: DataFrame, customer: DataFrame): DataFrame =
    view.unionByName(partialJoinState(delta, customer))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n"), sum(col("rev_raw")).as("rev_raw"))

  /** mv02: incremental maintenance of an aggregate-JOIN view — same
    * base/H1/H2 refresh schedule as mv01, with the fact⋈dim join inside
    * the view definition. Oracle = full join recompute: equality shows
    * the delta-join algebra loses nothing across merges.
    */
  def mv02JoinView(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val y = year(col("o_orderdate"))
    val maxRow = orders.agg(max(y)).collect().head
    def pres(v: DataFrame): DataFrame =
      v.select(
        col("c_mktsegment"), col("o_orderstatus"), col("n"),
        (col("rev_raw") / 100.0).as("rev"))
        .orderBy(col("c_mktsegment"), col("o_orderstatus"))
    if (maxRow.isNullAt(0)) return pres(partialJoinState(orders, customer))
    val maxYear = maxRow.getInt(0)
    val base = orders.filter(y.isNull || y < maxYear)
    val h1 = orders.filter(y === maxYear && month(col("o_orderdate")) <= 6)
    val h2 = orders.filter(y === maxYear && month(col("o_orderdate")) > 6)
    pres(mergeJoinDelta(
      mergeJoinDelta(partialJoinState(base, customer), h1, customer), h2, customer))
  }

  /** Signed (multiset) partial state for RETRACTABLE views — mv04.
    *
    * Deletes are just deltas with sign = -1, the classic
    * count/sum-with-multiplicity algebra. Money is kept as integer
    * CENTS inside the state: double sums are only approximately
    * associative, so float insert-then-delete would drift from the
    * recompute by ulps — integer arithmetic makes retraction EXACT,
    * which is what lets the oracle hash-match a view that has seen
    * deletes. Groups whose multiplicity reaches zero drop out.
    */
  def signedState(orders: DataFrame, sign: Int): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(
        (count(lit(1)) * sign).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) * sign).as("cents"))

  def mergeSigned(view: DataFrame, delta: DataFrame, sign: Int): DataFrame =
    view.unionByName(signedState(delta, sign))
      .groupBy(col("o_year"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      .filter(col("n") =!= 0)

  /** mv04: retractable-view maintenance, gated — build on all orders,
    * DELETE the keys with o_orderkey % 10 == 7, then re-insert the
    * half of them with o_orderkey % 20 == 7. The oracle is the plain
    * recompute over the surviving key set: equality proves the signed
    * algebra supports deletion exactly (not just insert-only growth,
    * which is all mv01-mv03 exercise).
    */
  def mv04RetractView(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val del = orders.filter(pmod(col("o_orderkey"), lit(10)) === 7)
    val reins = orders.filter(pmod(col("o_orderkey"), lit(20)) === 7)
    val v = mergeSigned(mergeSigned(signedState(orders, 1), del, -1), reins, 1)
    v.select(
      col("o_year"), col("o_orderstatus"), col("n"),
      round(col("cents") / 100.0, 2).as("rev"))
      .orderBy(col("o_year"), col("o_orderstatus"))
  }

  /** Signed partial state THROUGH a join — mv07. The delta-join rule
    * of incremental view maintenance with retractions (the signed
    * dataflow DBSP/Materialize-style engines run): for a static dim D,
    * ΔV = agg(ΔO ⋈ D) with ΔO carrying ±1 multiplicities, so deletes
    * ride the SAME O(delta) broadcast-join refresh inserts do — no
    * re-join of the base fact table, ever. Integer-cents money makes
    * insert-then-delete a bit-exact identity (mv04's argument), and
    * emptied groups drop — through the join.
    */
  def signedJoinState(
      orders: DataFrame, customer: DataFrame, sign: Int): DataFrame =
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        (count(lit(1)) * sign).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) * sign).as("cents"))

  def mergeSignedJoin(
      view: DataFrame, delta: DataFrame, customer: DataFrame,
      sign: Int): DataFrame =
    view.unionByName(signedJoinState(delta, customer, sign))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      .filter(col("n") =!= 0)

  /** mv07: RETRACTABLE JOIN view — mv02's join view under mv04's
    * delete/re-insert schedule. The capability neither covers alone:
    * mv02 maintains a join but only grows, mv04 retracts but joins
    * nothing. Oracle = plain recompute of the join over the surviving
    * multiset — equality proves delta-join retraction is exact.
    */
  def mv07RetractJoinView(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val del = orders.filter(pmod(col("o_orderkey"), lit(10)) === 7)
    val reins = orders.filter(pmod(col("o_orderkey"), lit(20)) === 7)
    val v = mergeSignedJoin(
      mergeSignedJoin(signedJoinState(orders, customer, 1), del, customer, -1),
      reins, customer, 1)
    v.select(
      col("c_mktsegment"), col("o_orderstatus"), col("n"),
      round(col("cents") / 100.0, 2).as("rev"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  val mv07OracleSql: String =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
      |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS rev
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey % 10 <> 7 OR o_orderkey % 20 = 7
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** TOP-K state per group — mv08. The insert-only merge law:
    * topk(topk(A) ∪ topk(B)) = topk(A ∪ B) — an element outside a
    * partial top-k can never re-enter under inserts, so the view
    * keeps O(groups × k) state and each refresh folds only the
    * delta's top-k. (The law breaks under DELETES — that regime needs
    * mv04's signed algebra over full multisets; this view is the
    * insert-only leaderboard every dashboard actually maintains.)
    */
  private val TopKViewK = 5

  def topkState(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(graft.functions.VectorFunctions.topKByScore(
        col("cents").cast("double"), col("o_orderkey"), TopKViewK).as("tk"))

  def mergeTopk(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(topkState(delta))
      .select(col("o_orderstatus"), explode(col("tk")).as("e"))
      .groupBy(col("o_orderstatus"))
      .agg(graft.functions.VectorFunctions.topKByScore(
        col("e.score"), col("e.id"), TopKViewK).as("tk"))

  def presentTopk(view: DataFrame): DataFrame =
    view.select(col("o_orderstatus"), posexplode(col("tk")))
      .select(
        col("o_orderstatus"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("o_orderkey"),
        col("col.score").cast("long").as("cents"))
      .orderBy(col("o_orderstatus"), col("rnk"))

  /** mv08: incremental TOP-K view — mv01's base/H1/H2 refresh
    * schedule over the per-status order-value leaderboard. Oracle =
    * full-recompute window top-5: equality proves the top-k-of-top-k
    * fold discards nothing that the full ranking keeps.
    */
  def mv08TopkView(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val y = year(col("o_orderdate"))
    val maxRow = orders.agg(max(y)).collect().head
    if (maxRow.isNullAt(0)) return presentTopk(topkState(orders))
    val maxYear = maxRow.getInt(0)
    val base = orders.filter(y.isNull || y < maxYear)
    val h1 = orders.filter(y === maxYear && month(col("o_orderdate")) <= 6)
    val h2 = orders.filter(y === maxYear && month(col("o_orderdate")) > 6)
    presentTopk(mergeTopk(mergeTopk(topkState(base), h1), h2))
  }

  /** Full-recompute replay with TopKByScore's exact tie-break
    * (score DESC, id ASC); integer cents keep scores engine-exact.
    */
  val mv08OracleSql: String =
    """SELECT o_orderstatus, CAST(rnk AS INT) AS rnk, o_orderkey,
      |  CAST(cents AS BIGINT) AS cents
      |FROM (
      |  SELECT o_orderstatus, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rnk
      |  FROM orders)
      |WHERE rnk <= 5
      |ORDER BY o_orderstatus, rnk""".stripMargin

  /** mv06: APPROXIMATE distinct-count view with mergeable SKETCH
    * state — the view the signed algebra (mv04) and semilattice
    * merges (mv05) both cannot give: count(DISTINCT) is neither
    * summable nor retractable, and keeping exact per-group key sets
    * grows with the key universe. The maintained state is a
    * datasketches HLL sketch per group (`hll_sketch_agg`), merged
    * across refreshes with `hll_union_agg` — constant bytes per group
    * forever, the only viable distinct-count view at 100 TB.
    *
    * The gate proves, in-row: (a) `merge_exact` — the three-refresh
    * merged sketch estimates IDENTICALLY to a single-shot sketch over
    * all rows (union of HLL registers is associative, so refresh
    * batching cannot change the answer); (b) `within_bound` — the
    * estimate sits within 5% + 2 of the exact distinct count (the
    * sketch's 3σ envelope at default lgK; small groups are EXACT in
    * sparse mode). The oracle replays the exact count and TRUE.
    */
  def mv06SketchView(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val y = year(col("o_orderdate"))
    def st(df: DataFrame): DataFrame =
      df.groupBy(y.as("o_year"), col("o_orderstatus"))
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
    def mergeSk(a: DataFrame, b: DataFrame): DataFrame =
      a.unionByName(b)
        .groupBy(col("o_year"), col("o_orderstatus"))
        .agg(expr("hll_union_agg(sk)").as("sk"))
    val maxRow = orders.agg(max(y)).collect().head
    val merged =
      if (maxRow.isNullAt(0)) st(orders)
      else {
        val maxYear = maxRow.getInt(0)
        val base = orders.filter(y.isNull || y < maxYear)
        val h1 = orders.filter(y === maxYear && month(col("o_orderdate")) <= 6)
        val h2 = orders.filter(y === maxYear && month(col("o_orderdate")) > 6)
        mergeSk(mergeSk(st(base), st(h1)), st(h2))
      }
    val est = merged.select(col("o_year"), col("o_orderstatus"),
      expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").as("est_merged"))
    val direct = st(orders).select(col("o_year"), col("o_orderstatus"),
      expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").as("est_direct"))
    val exact = orders.groupBy(y.as("o_year"), col("o_orderstatus"))
      .agg(count_distinct(col("o_custkey")).as("exact_nd"))
    exact
      .join(est, Seq("o_year", "o_orderstatus"))
      .join(direct, Seq("o_year", "o_orderstatus"))
      .select(col("o_year"), col("o_orderstatus"), col("exact_nd"),
        (abs(col("est_merged") - col("exact_nd"))
          <= col("exact_nd") * lit(0.05) + lit(2)).as("within_bound"),
        (col("est_merged") === col("est_direct")).as("merge_exact"))
      .orderBy(col("o_year"), col("o_orderstatus"))
  }

  val mv06OracleSql: String =
    """SELECT year(o_orderdate) AS o_year, o_orderstatus,
      |  count(DISTINCT o_custkey) AS exact_nd,
      |  TRUE AS within_bound,
      |  TRUE AS merge_exact
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Order-statistics partial state for mv05: min/max/count per group.
    * min/max merge losslessly under INSERT-ONLY refreshes (they form a
    * semilattice: merge = min/max of states); they are exactly the
    * aggregates the signed mv04 algebra CANNOT retract (deleting the
    * current max needs the runner-up, which the state doesn't hold) —
    * a production engine falls back to per-group recompute on delete,
    * which is why this view is maintained insert-only.
    */
  def minmaxState(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))

  def mergeMinmax(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(minmaxState(delta))
      .groupBy(col("o_year"), col("o_orderstatus"))
      .agg(
        sum(col("n")).as("n"),
        min(col("min_price")).as("min_price"),
        max(col("max_price")).as("max_price"))

  /** mv05: min/max view under the same base/H1/H2 insert-only refresh
    * schedule as mv01. Oracle = full recompute; equality proves the
    * semilattice merge loses nothing across refreshes.
    */
  def mv05MinmaxView(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val y = year(col("o_orderdate"))
    def pres(v: DataFrame): DataFrame =
      v.select(
        col("o_year"), col("o_orderstatus"), col("n"),
        round(col("min_price"), 2).as("min_price"),
        round(col("max_price"), 2).as("max_price"))
        .orderBy(col("o_year"), col("o_orderstatus"))
    val maxRow = orders.agg(max(y)).collect().head
    if (maxRow.isNullAt(0)) return pres(minmaxState(orders))
    val maxYear = maxRow.getInt(0)
    val base = orders.filter(y.isNull || y < maxYear)
    val h1 = orders.filter(y === maxYear && month(col("o_orderdate")) <= 6)
    val h2 = orders.filter(y === maxYear && month(col("o_orderdate")) > 6)
    pres(mergeMinmax(mergeMinmax(minmaxState(base), h1), h2))
  }

  /** mv09: CDF-DRIVEN view maintenance over a MUTATING base — the
    * retract algebra the insert-only mv01/mv03 loop cannot express: a
    * per-status (count, cents) view maintained from NOTHING but the
    * typed change feed, where insert/update_postimage rows add
    * (+1, +cents) and delete/update_preimage rows RETRACT (−1,
    * −cents) — Flink's retract-stream aggregation re-expressed over
    * the lake's CDF. The base takes every mutation kind (append,
    * UPDATE, copy-on-write delete, merge-on-read delete); the view
    * folds the whole feed in ONE partial-agg pass (O(changes) read,
    * O(groups) state) and is proven equal to the full recompute
    * in-row.
    *
    * At 100 TB: each refresh reads ONLY the commits since the last
    * fold (`changesTyped(from)`) — O(delta) — and merges O(groups)
    * rows into the stored view; this gate folds from −1 to show the
    * algebra is total.
    */
  def mv09CdfView(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.GraftLake
    val path = graft.SparkEntry.scratch("graft_mv09_base", dir)
    graft.SparkEntry.rmrf(path)
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val k = col("o_orderkey")
    GraftLake.create(o.filter(pmod(k, lit(3)) < 2), path, Some("o_orderkey"))
    GraftLake.enableCdf(path)
    GraftLake.append(o.filter(pmod(k, lit(3)) === 2), path,
      statsCol = Some("o_orderkey"))                               // v1
    GraftLake.update(spark, path, pmod(k, lit(7)) === 3,
      Seq("cents" -> (col("cents") + 41L)), Some("o_orderkey"))    // v2
    GraftLake.delete(spark, path, pmod(k, lit(5)) === 2,
      Some("o_orderkey"))                                          // v3
    GraftLake.deleteMoR(spark, path, pmod(k, lit(11)) === 9,
      "o_orderkey")                                                // v4
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val view = GraftLake.changesTyped(spark, path, -1)
      .groupBy(col("o_orderstatus"))
      .agg(sum(sign).as("n"), sum(sign * col("cents")).as("cents"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    val recompute = GraftLake.read(spark, path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    // Tagged-union (count, xxhash64-sum) multiset signature — ONE
    // execution covers both sides (SparkEntry.multisetEqual).
    val same = graft.SparkEntry.multisetEqual(view, recompute)
    view.withColumn("retract_equals_recompute", lit(same))
      .orderBy(col("o_orderstatus"))
  }

  val mv09OracleSql: String =
    """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |f AS (SELECT k, st,
      |    CASE WHEN k % 7 = 3 THEN cents + 41 ELSE cents END AS cents
      |  FROM o WHERE k % 5 <> 2 AND k % 11 <> 9)
      |SELECT st AS o_orderstatus, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS cents,
      |  TRUE AS retract_equals_recompute
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
}
