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

  /** Exact per-group continuous percentiles with NO data shuffle at
    * all — the iterative histogram-narrowing form of the classic
    * distributed exact-median algorithm:
    *
    *  1. per-group (count, min, max) — one partial-agg scan;
    *  2. per-group equi-width histogram over [min, max] — one
    *     partial-agg scan producing O(|groups| x nBuckets) counts;
    *  3. cumulative counts locate the bucket(s) holding each target
    *     order statistic; ONLY those buckets' rows (re-selected with
    *     the SAME bucket expression, so FP bucket-edge wobble cannot
    *     mis-rank) are collected and the order statistic is read off
    *     exactly, with type-7 interpolation.
    *
    * If the needed buckets still hold too many rows (pathological
    * skew), the histogram pass repeats on the narrowed range — each
    * round divides the candidate count by ~nBuckets, so two passes
    * cover 10^8 rows per group at nBuckets=8192. Compared to
    * [[exactByRank]] this never range-shuffles the table: all data
    * movement is O(|groups| x nBuckets) aggregate rows, the shape
    * that wins at 100 TB (and locally).
    */
  def exactByHistogram(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], outNames: Seq[String],
      nBuckets: Int = 8192, maxCollect: Int = 1 << 22): DataFrame = {
    require(ps.length == outNames.length, "one output name per fraction")
    val spark = df.sparkSession
    import spark.implicits._

    val rows = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)

    val stats = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"), max(col("__v")).as("hi"))
      .collect()
      .map(r => (r.get(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))

    // Per group: the 0-based target order-statistic ranks and their
    // type-7 interpolation fractions.
    case class Target(j: Int, rank: Long, frac: Double)
    val targets: Map[Any, Seq[Target]] = stats.map { case (g, (n, _, _)) =>
      g -> ps.zipWithIndex.map { case (p, j) =>
        val pos = p * (n - 1)
        Target(j, math.floor(pos).toLong, pos - math.floor(pos))
      }
    }.toMap

    // Per-group narrowing state. `pred` is the ACCUMULATED bucket
    // predicate chain: each round's bucket expression clamps into
    // [0, nBuckets-1], so every round partitions exactly the rows the
    // previous round counted — FP wobble at bucket edges merely moves a
    // row between adjacent buckets of the SAME partition, never in or
    // out of it, which keeps `base` (rows ranked below the kept range)
    // exact. `lo`/`hi` only seed the next bucket width and a widened,
    // parquet-pushable pre-filter.
    case class St(pred: Column, base: Long, cnt: Long, lo: Double, hi: Double)
    var state: Map[Any, St] = stats.map { case (g, (n, lo, hi)) =>
      g -> St(col(groupCol) === lit(g), 0L, n, lo, hi)
    }.toMap

    def widened(s: St): Column =
      col("__v") >= lit(math.nextDown(s.lo)) && col("__v") <= lit(math.nextUp(s.hi))

    def bucketOf(s: St): Column = {
      val w = (s.hi - s.lo) / nBuckets
      if (w <= 0.0) lit(0)
      else greatest(
        least(floor((col("__v") - lit(s.lo)) / lit(w)).cast("int"), lit(nBuckets - 1)),
        lit(0))
    }

    var out = Map.empty[Any, Seq[(Int, Double)]] // group -> (j, value)
    var rounds = 0
    while (out.size < state.size && rounds < 8) {
      rounds += 1
      val remaining = state.filter { case (g, _) => !out.contains(g) }
      val small = remaining.filter(_._2.cnt <= maxCollect / math.max(1, remaining.size))
      val big = remaining -- small.keys

      if (small.nonEmpty) {
        // Resolved groups: collect exactly the counted candidate rows.
        val cond = small.values.map(s => s.pred && widened(s)).reduce(_ || _)
        val collected = rows.filter(cond).collect()
          .map(r => (r.get(0), r.getDouble(1)))
          .groupBy(_._1)
        small.foreach { case (g, s) =>
          val vs = collected.getOrElse(g, Array.empty).map(_._2).sorted
          out += g -> targets(g).map { t =>
            val i = (t.rank - s.base).toInt
            val vLo = vs(i)
            val vHi = if (t.frac == 0.0) vLo else vs(i + 1)
            (t.j, vLo + (vHi - vLo) * t.frac)
          }
        }
      }

      big.foreach { case (g, s) =>
        // One histogram pass per oversized group (few groups by
        // contract; a multi-group pass would need per-group bucket
        // exprs in one CASE — not worth it for the target shape).
        val hist = rows
          .filter(s.pred && widened(s))
          .groupBy(bucketOf(s).as("__b"))
          .agg(count(lit(1)).as("c"), min(col("__v")).as("mn"), max(col("__v")).as("mx"))
          .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        val counts = new Array[Long](nBuckets)
        hist.foreach { case (b, (c, _, _)) => counts(b) = c }
        val cum = counts.scanLeft(s.base)(_ + _) // cum(b) = rows ranked below bucket b
        val needed = targets(g).flatMap(t => Seq(t.rank, math.min(t.rank + 1, cum.last - 1)))
        val bs = needed.map(r => counts.indices.find(b => cum(b + 1) > r).getOrElse(nBuckets - 1))
        val bLo = bs.min
        val bHi = bs.max
        val kept = hist.filter { case (b, _) => b >= bLo && b <= bHi }
        val keptMin = kept.map(_._2._2).min
        val keptMax = kept.map(_._2._3).max
        if (keptMin == keptMax) {
          // A duplicate-heavy bucket that can't narrow further: every
          // needed order statistic IS that value — resolve directly
          // instead of looping on an unsplittable range.
          out += g -> targets(g).map(t => (t.j, keptMin))
        } else {
          val w = (s.hi - s.lo) / nBuckets
          state += g -> St(
            s.pred && bucketOf(s).between(bLo, bHi),
            cum(bLo),
            (bLo to bHi).map(counts).sum,
            math.max(s.lo + bLo * w, keptMin),
            math.min(if (bHi >= nBuckets - 1) s.hi else s.lo + (bHi + 1) * w, keptMax))
        }
      }
    }
    require(out.size == state.size,
      s"histogram percentile did not converge in $rounds rounds")

    // Restore the ORIGINAL group key type: join the computed values
    // back to the |groups|-row key list on a stringified key.
    val resultRows = out.toSeq.map { case (g, vs) =>
      (g.toString, vs.sortBy(_._1).map(_._2))
    }.toDF("__g", "__vs")
    val groups = spark.createDataFrame(
      spark.sparkContext.parallelize(
        stats.map(_._1).map(org.apache.spark.sql.Row(_)).toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(df.schema(groupCol))))
    val sel = outNames.zipWithIndex.map { case (name, j) =>
      element_at(col("__vs"), j + 1).as(name)
    }
    groups
      .withColumn("__g", col(groupCol).cast("string"))
      .join(resultRows, "__g")
      .select(col(groupCol) +: sel: _*)
  }
}
