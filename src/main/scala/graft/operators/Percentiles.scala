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

    // The resolution unit is an ORDER-STATISTIC RANK: each target needs
    // the value at `rank` (and `rank + 1` when it interpolates), and
    // ranks resolve independently — so p01 and p99 narrow separate
    // bucket clusters instead of pinning one giant contiguous range
    // that could never shrink.
    //
    // Narrowing state (one per bucket cluster): `pred` is the
    // ACCUMULATED bucket-predicate chain — every round's bucket
    // expression clamps into [0, nBuckets-1], so each round partitions
    // exactly the rows the previous round counted. FP wobble at bucket
    // edges merely moves a row between adjacent buckets of the SAME
    // partition, never in or out of it, keeping `base` (rows ranked
    // below the cluster) exact. `lo`/`hi` seed the next bucket grid
    // and a widened, parquet-pushable pre-filter.
    case class St(g: Any, ranks: Seq[Long], pred: Column,
        base: Long, cnt: Long, lo: Double, hi: Double)

    def widened(s: St): Column =
      col("__v") >= lit(math.nextDown(s.lo)) && col("__v") <= lit(math.nextUp(s.hi))

    def bucketOf(s: St): Column = {
      val w = (s.hi - s.lo) / nBuckets
      if (w <= 0.0) lit(0)
      else greatest(
        least(floor((col("__v") - lit(s.lo)) / lit(w)).cast("int"), lit(nBuckets - 1)),
        lit(0))
    }

    val neededRanks: Map[Any, Seq[Long]] = targets.map { case (g, ts) =>
      g -> ts.flatMap(t =>
        if (t.frac == 0.0) Seq(t.rank) else Seq(t.rank, t.rank + 1)).distinct.sorted
    }
    var live: List[St] = stats.toList.map { case (g, (n, lo, hi)) =>
      St(g, neededRanks(g), col(groupCol) === lit(g), 0L, n, lo, hi)
    }
    val resolved = scala.collection.mutable.Map.empty[(String, Long), Double]
    var rounds = 0
    while (live.nonEmpty && rounds < 12) {
      rounds += 1
      val budget = math.max(1L, maxCollect.toLong / live.size)
      val (small, big) = live.partition(_.cnt <= budget)

      small.foreach { s =>
        // Cluster fits in one collect: read the order statistics off
        // the sorted candidate rows (rank - base indexes into them).
        val vs = rows.filter(s.pred && widened(s))
          .collect().map(_.getDouble(1)).sorted
        s.ranks.foreach(r => resolved((s.g.toString, r)) = vs((r - s.base).toInt))
      }

      live = big.flatMap { s =>
        // One histogram pass per oversized cluster (cluster count is
        // bounded by |groups| x |ranks| and shrinks every round).
        val hist = rows
          .filter(s.pred && widened(s))
          .groupBy(bucketOf(s).as("__b"))
          .agg(count(lit(1)).as("c"), min(col("__v")).as("mn"), max(col("__v")).as("mx"))
          .collect()
          .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
          .toMap
        val counts = Array.tabulate(nBuckets)(b => hist.get(b).map(_._1).getOrElse(0L))
        val cum = counts.scanLeft(s.base)(_ + _) // cum(b) = rows ranked below bucket b
        def bucketFor(r: Long): Int =
          counts.indices.find(b => cum(b + 1) > r).getOrElse(nBuckets - 1)
        // A rank whose bucket holds a single distinct value resolves
        // exactly — this is what terminates duplicate floods.
        val open = s.ranks.filter { r =>
          val (_, mn, mx) = hist(bucketFor(r))
          if (mn == mx) { resolved((s.g.toString, r)) = mn; false } else true
        }
        // Remaining ranks cluster by contiguous runs of their buckets;
        // each run narrows independently next round.
        val byBucket = open.groupBy(bucketFor)
        val runs = byBucket.keys.toSeq.sorted
          .foldLeft(List.empty[List[Int]]) {
            case (acc @ (run :: rest), b) if b == run.head + 1 => (b :: run) :: rest
            case (acc, b) => List(b) :: acc
          }
        runs.map { run =>
          val (bLo, bHi) = (run.min, run.max)
          St(s.g, run.flatMap(byBucket.getOrElse(_, Nil)).sorted,
            s.pred && bucketOf(s).between(bLo, bHi),
            cum(bLo), (bLo to bHi).map(counts).sum,
            run.map(b => hist(b)._2).min, run.map(b => hist(b)._3).max)
        }
      }
    }
    require(live.isEmpty,
      s"histogram percentile did not converge in $rounds rounds")

    val out: Seq[(String, Seq[Double])] = stats.toSeq.map { case (g, _) =>
      g.toString -> targets(g).sortBy(_.j).map { t =>
        val vLo = resolved((g.toString, t.rank))
        val vHi = if (t.frac == 0.0) vLo else resolved((g.toString, t.rank + 1))
        vLo + (vHi - vLo) * t.frac
      }
    }

    // Restore the ORIGINAL group key type: join the computed values
    // back to the |groups|-row key list on a stringified key.
    val resultRows = out.toDF("__g", "__vs")
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
