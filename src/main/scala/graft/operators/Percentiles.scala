package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact per-group continuous percentiles WITHOUT a per-group O(rows)
  * aggregation buffer.
  *
  * Spark's exact `percentile` aggregate holds a value->count map per
  * group in a single task's memory — fine for low-cardinality columns,
  * O(rows) state for high-cardinality ones (prices, timestamps): the
  * classic 100 TB OOM. This plan computes the same type-7 order
  * statistics fully distributed:
  *
  *  1. per-group counts (tiny: |groups| rows, partial-agg, collected);
  *  2. one two-pass global rank over (group, value) via
  *     [[Ranks.withGlobalIndex]] — range shuffle + local sort, no task
  *     ever holds more than 1/numPartitions of the data;
  *  3. the percentile positions p*(n-1) per group become GLOBAL index
  *     targets (group offset + within-group rank), broadcast, and the
  *     two bracketing order statistics are picked out of the ranked
  *     data with a broadcast hash join — O(|groups| x |ps|) rows out;
  *  4. linear interpolation v_lo + (v_hi - v_lo) * frac, the same
  *     formula `percentile` / DuckDB `quantile_cont` use.
  *
  * Group keys must order identically under the range partitioner and
  * the driver-side sort building offsets (ASCII strings / numerics —
  * see [[Ranks]] scaladoc).
  */
object Percentiles {

  /** One output row per group: (groupCol, outNames...) with the exact
    * continuous percentiles of `valueCol` at fractions `ps`. Null
    * values are excluded (matching SQL percentile semantics); groups
    * with only nulls are omitted.
    */
  def exactByRank(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.length == outNames.length, "one output name per fraction")
    val spark = df.sparkSession
    import spark.implicits._

    val rows = df.select(col(groupCol), col(valueCol).cast("double").as(valueCol))
      .filter(col(valueCol).isNotNull)

    // |groups| rows: partial-aggregated count, then driver-side offsets
    // in the SAME order the range partitioner sorts the group key
    // (numeric order for numbers, UTF8 binary order for ASCII strings).
    val counts = rows.groupBy(col(groupCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortWith((a, b) => (a._1, b._1) match {
        case (x: java.lang.Number, y: java.lang.Number) => x.doubleValue < y.doubleValue
        case (x, y) => x.toString < y.toString
      })
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init

    // Targets: for each (group, fraction) the GLOBAL indices of the two
    // bracketing order statistics (group offset + within-group rank).
    // Global indices are disjoint across groups, so the join below needs
    // no group key — the picked row carries its own group value. lo ==
    // hi (frac 0) when the position is integral, so the interpolation
    // degenerates to v_lo.
    val targets = counts.map(_._2).zip(offsets).flatMap { case (n, off) =>
      ps.zipWithIndex.flatMap { case (p, j) =>
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val frac = pos - lo
        if (lo == hi) Seq((j, off + lo, false, 0.0))
        else Seq((j, off + lo, false, frac), (j, off + hi, true, frac))
      }
    }.toSeq.toDF("__j", "__target", "__is_hi", "__frac")

    val ranked = Ranks.withGlobalIndex(
      rows, Seq(col(groupCol), col(valueCol)), "__idx")

    // Broadcast hash join on the global index: one pass over the ranked
    // data, |groups| x |ps| x 2 rows survive.
    val picked = ranked
      .join(broadcast(targets), col("__idx") === col("__target"))
      .groupBy(col(groupCol), col("__j"))
      .agg(
        max(when(!col("__is_hi"), col(valueCol))).as("__v_lo"),
        max(when(col("__is_hi"), col(valueCol))).as("__v_hi"),
        first(col("__frac")).as("__f"))
      .withColumn("__v",
        col("__v_lo") + (coalesce(col("__v_hi"), col("__v_lo")) - col("__v_lo")) * col("__f"))

    // Pivot the |groups| x |ps| result to one row per group.
    val aggs = outNames.zipWithIndex.map { case (name, j) =>
      max(when(col("__j") === j, col("__v"))).as(name)
    }
    picked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
