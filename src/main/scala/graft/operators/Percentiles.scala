package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

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
  * see [[Ranks]] scaladoc). Null group keys sort first, matching
  * Spark's ascending null ordering.
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
    // (nulls first, numeric order for numbers, UTF8 binary order for
    // ASCII strings).
    val counts = rows.groupBy(col(groupCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortWith((a, b) => (a._1, b._1) match {
        case (null, _) => true
        case (_, null) => false
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
    *  2. per round, ONE histogram job covering EVERY live bucket
    *     cluster: rows broadcast-join the tiny (cluster, group-key,
    *     lo, hi) table (null-safe on the key), bucket into the
    *     cluster's equi-width grid over [lo, hi], and a single
    *     partial-agg groupBy(cluster, bucket) emits
    *     O(|clusters| x nBuckets) (count, min, max) rows;
    *  3. cumulative counts locate the bucket run holding each target
    *     order statistic; each run becomes next round's cluster,
    *     narrowed to the run's ACTUAL data min/max. The bucket
    *     expression clamp(floor((v - lo) / w)) is monotone in v and
    *     deterministic per value, so buckets are value-ordered with
    *     strict value boundaries — a run's rows are EXACTLY the
    *     group's rows with v in [run-min, run-max], which keeps
    *     `base` (rows ranked below the cluster) exact under FP
    *     bucket-edge wobble, and the range predicate re-selects the
    *     identical row set each round;
    *  4. clusters that fit the driver budget resolve by reading the
    *     order statistic off their sorted rows — ALL small clusters
    *     batched into one collect job (<= maxCollect rows total) —
    *     with type-7 interpolation; buckets where min == max resolve
    *     exactly (what terminates duplicate floods).
    *
    * Each round divides a cluster's candidate count by ~nBuckets, so
    * two histogram passes cover 10^8-row groups at the default budget.
    * Compared to [[exactByRank]] this never shuffles data: all
    * movement is O(|clusters| x nBuckets) aggregate rows — the shape
    * that wins at 100 TB. The 2-column projection is cached across
    * rounds (rounds 2+ touch only narrowed clusters).
    *
    * The default `maxCollect` is deliberately small (2^18) so that
    * benchmark-scale runs exercise the histogram rounds — the plan
    * being measured IS the plan that runs at scale, not a
    * driver-collect shortcut. Null group keys are supported (driver
    * state keys by group INDEX, never a stringified key).
    */
  def exactByHistogram(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], outNames: Seq[String],
      nBuckets: Int = 8192, maxCollect: Int = 1 << 18,
      discrete: Boolean = false): DataFrame = {
    require(ps.length == outNames.length, "one output name per fraction")
    val spark = df.sparkSession

    val rows = df.select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .persist()

    val stats: Array[(Any, (Long, Double, Double))] = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"), max(col("__v")).as("hi"))
      .collect()
      .map(r => (r.get(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))

    // Per group (keyed by index into `stats`): the 0-based target
    // order-statistic ranks and their type-7 interpolation fractions.
    // `discrete` = nearest-rank (percentile_disc): the smallest value
    // whose cume_dist >= p, i.e. 0-based rank ceil(p·n) - 1, frac 0 —
    // the answer is always an actual data value. Otherwise type-7
    // continuous interpolation at p·(n-1).
    case class Target(j: Int, rank: Long, frac: Double)
    val targets: Array[Seq[Target]] = stats.map { case (_, (n, _, _)) =>
      ps.zipWithIndex.map { case (p, j) =>
        if (discrete) Target(j, math.max(0L, math.ceil(p * n).toLong - 1L), 0.0)
        else {
          val pos = p * (n - 1)
          Target(j, math.floor(pos).toLong, pos - math.floor(pos))
        }
      }
    }
    val neededRanks: Array[Seq[Long]] = targets.map(ts =>
      ts.flatMap(t =>
        if (t.frac == 0.0) Seq(t.rank) else Seq(t.rank, t.rank + 1)).distinct.sorted)

    // One cluster per contiguous run of unresolved ranks: its rows are
    // exactly { group == key(gid) && lo <= v <= hi } with lo/hi actual
    // data min/max; `base` = group rows ranked strictly below it.
    case class St(gid: Int, ranks: Seq[Long], base: Long, cnt: Long, lo: Double, hi: Double)
    var live: List[St] = stats.toList.zipWithIndex.map { case ((_, (n, lo, hi)), gid) =>
      St(gid, neededRanks(gid), 0L, n, lo, hi)
    }
    val resolved = scala.collection.mutable.Map.empty[(Int, Long), Double]

    val keyField = df.schema(groupCol)
    def clusterDf(cs: Seq[(St, Int)]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(cs.map { case (s, cid) =>
          Row(cid, stats(s.gid)._1, s.lo, s.hi)
        }.toSeq, 1),
        StructType(Seq(
          StructField("__cid", IntegerType, nullable = false),
          StructField("__gk", keyField.dataType, nullable = true),
          StructField("__lo", DoubleType, nullable = false),
          StructField("__hi", DoubleType, nullable = false))))

    // Membership: null-safe equi-join on the group key (a broadcast
    // hash join) with the cluster's closed value range as the join
    // filter. The cluster table is O(|groups| x |ranks|) rows.
    def memberRows(cs: Seq[(St, Int)]): DataFrame =
      rows.join(broadcast(clusterDf(cs)),
        col("__g") <=> col("__gk") && col("__v") >= col("__lo") && col("__v") <= col("__hi"))

    var rounds = 0
    while (live.nonEmpty && rounds < 12) {
      rounds += 1
      val budget = math.max(1L, maxCollect.toLong / live.size)
      val (small, big) = live.partition(_.cnt <= budget)

      if (small.nonEmpty) {
        // Every small cluster resolves from ONE collect job, bounded by
        // maxCollect rows total across clusters.
        val byCid = memberRows(small.zipWithIndex)
          .select(col("__cid"), col("__v")).collect()
          .groupBy(_.getInt(0))
        small.zipWithIndex.foreach { case (s, cid) =>
          val vs = byCid.getOrElse(cid, Array.empty[Row]).map(_.getDouble(1)).sorted
          require(vs.length == s.cnt,
            s"histogram-percentile cluster drift: expected ${s.cnt} rows, got ${vs.length}")
          s.ranks.foreach(r => resolved((s.gid, r)) = vs((r - s.base).toInt))
        }
      }

      live = if (big.isEmpty) Nil
      else {
        // ONE histogram job across every oversized cluster.
        val w = (col("__hi") - col("__lo")) / lit(nBuckets.toDouble)
        val bkt = when(col("__hi") <= col("__lo"), lit(0)).otherwise(
          greatest(
            least(floor((col("__v") - col("__lo")) / w).cast("int"), lit(nBuckets - 1)),
            lit(0)))
        val hists: Map[Int, Map[Int, (Long, Double, Double)]] =
          memberRows(big.zipWithIndex)
            .groupBy(col("__cid"), bkt.as("__b"))
            .agg(count(lit(1)).as("c"), min(col("__v")).as("mn"), max(col("__v")).as("mx"))
            .collect()
            .map(r => (r.getInt(0), (r.getInt(1), (r.getLong(2), r.getDouble(3), r.getDouble(4)))))
            .groupBy(_._1)
            .map { case (cid, rs) => cid -> rs.map(_._2).toMap }

        big.zipWithIndex.flatMap { case (s, cid) =>
          val hist = hists.getOrElse(cid, Map.empty)
          val counts = Array.tabulate(nBuckets)(b => hist.get(b).map(_._1).getOrElse(0L))
          require(counts.sum == s.cnt,
            s"histogram-percentile cluster drift: expected ${s.cnt} rows, counted ${counts.sum}")
          val cum = counts.scanLeft(s.base)(_ + _) // cum(b) = rows ranked below bucket b
          def bucketFor(r: Long): Int =
            counts.indices.find(b => cum(b + 1) > r).getOrElse(nBuckets - 1)
          // A rank whose bucket holds a single distinct value resolves
          // exactly — this is what terminates duplicate floods.
          val open = s.ranks.filter { r =>
            val (_, mn, mx) = hist(bucketFor(r))
            if (mn == mx) { resolved((s.gid, r)) = mn; false } else true
          }
          // Remaining ranks cluster by contiguous runs of their buckets;
          // each run narrows independently next round.
          val byBucket = open.groupBy(bucketFor)
          val runs = byBucket.keys.toSeq.sorted
            .foldLeft(List.empty[List[Int]]) {
              case (run :: rest, b) if b == run.head + 1 => (b :: run) :: rest
              case (acc, b) => List(b) :: acc
            }
          runs.map { run =>
            val (bLo, bHi) = (run.min, run.max)
            St(s.gid, run.flatMap(byBucket.getOrElse(_, Nil)).sorted,
              cum(bLo), (bLo to bHi).map(counts(_)).sum,
              run.map(b => hist(b)._2).min, run.map(b => hist(b)._3).max)
          }
        }
      }
    }
    require(live.isEmpty,
      s"histogram percentile did not converge in $rounds rounds")
    rows.unpersist(false)

    // Assemble the |groups|-row result on the driver with the ORIGINAL
    // key objects — no stringified-key re-join, so Decimal / Float /
    // null keys round-trip exactly.
    val outRows = stats.zipWithIndex.map { case ((g, _), gid) =>
      val vals = targets(gid).sortBy(_.j).map { t =>
        val vLo = resolved((gid, t.rank))
        val vHi = if (t.frac == 0.0) vLo else resolved((gid, t.rank + 1))
        vLo + (vHi - vLo) * t.frac
      }
      Row.fromSeq(g +: vals)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq, 1),
      StructType(keyField +: outNames.map(n => StructField(n, DoubleType))))
  }
}
