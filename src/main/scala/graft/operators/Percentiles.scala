package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

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
      discrete: Boolean = false): DataFrame =
    exactByHistogramMulti(df, groupCol,
      Seq(HistSpec(valueCol, ps, outNames, discrete)), nBuckets, maxCollect)

  /** One value column's percentile request for
    * [[exactByHistogramMulti]]: fractions `ps` land in output columns
    * `outNames`; `discrete` = nearest-rank (`percentile_disc`)
    * semantics, otherwise type-7 continuous interpolation.
    */
  case class HistSpec(
      valueCol: String, ps: Seq[Double], outNames: Seq[String],
      discrete: Boolean = false)

  /** Exact per-group percentiles of SEVERAL value columns in ONE
    * narrowing loop: one cached 2+K-column projection, one fused
    * per-group stats job, and per round ONE histogram job covering
    * every live cluster of every lane (guide §1.2 "remove passes" —
    * the fusion halves q34's pass count vs two independent ladders).
    * Output: one row per group holding every spec's outNames; groups
    * with no non-null value in SOME lane are dropped (the same inner
    * semantics as joining per-column results). Resolution math is
    * identical to the single-column form — each (lane, group) narrows
    * independently, so fusing lanes changes job shape, never values.
    */
  def exactByHistogramMulti(
      df: DataFrame, groupCol: String, specs: Seq[HistSpec],
      nBuckets: Int = 8192, maxCollect: Int = 1 << 18): DataFrame = {
    require(specs.nonEmpty, "no percentile specs")
    specs.foreach(s =>
      require(s.ps.length == s.outNames.length, "one output name per fraction"))
    val spark = df.sparkSession
    val keyField = df.schema(groupCol)

    val rows = df.select(
      (col(groupCol).as("__g") +: specs.zipWithIndex.map { case (s, i) =>
        col(s.valueCol).cast("double").as(s"__v$i")
      }).toIndexedSeq: _*)
      .filter(specs.indices.map(i => col(s"__v$i").isNotNull).reduce(_ || _))
      .persist()

    // ONE stats job: per group, every lane's non-null count and actual
    // min/max (count(col) skips nulls, so each lane sees exactly its
    // own non-null population — same as the single-column filter).
    val statAggs = specs.indices.flatMap(i => Seq(
      count(col(s"__v$i")).as(s"n_$i"),
      min(col(s"__v$i")).as(s"lo_$i"),
      max(col(s"__v$i")).as(s"hi_$i")))
    val statRows = rows.groupBy(col("__g"))
      .agg(statAggs.head, statAggs.tail: _*).collect()
    val keys: Array[Any] = statRows.map(_.get(0))

    val targets: Array[Array[Seq[Target]]] = Array.tabulate(specs.length) { i =>
      statRows.map { r =>
        val n = r.getLong(1 + 3 * i)
        if (n == 0L) Seq.empty[Target]
        else targetsFor(n, specs(i).ps, specs(i).discrete)
      }
    }
    val lanes = specs.indices.map { i =>
      val bounds: Array[Option[(Long, Double, Double)]] = statRows.map { r =>
        val n = r.getLong(1 + 3 * i)
        if (n == 0L) None
        else Some((n, r.getDouble(1 + 3 * i + 1), r.getDouble(1 + 3 * i + 2)))
      }
      val needed = targets(i).map(ts => ts.flatMap(t =>
        if (t.frac == 0.0) Seq(t.rank) else Seq(t.rank, t.rank + 1))
        .distinct.sorted)
      Lane(i, None, bounds, needed)
    }
    val resolved = resolveRanks(rows, keyField.dataType, keys, lanes,
      specs.length, nBuckets, maxCollect)
    rows.unpersist(false)

    // Assemble the |groups|-row result on the driver with the ORIGINAL
    // key objects — no stringified-key re-join, so Decimal / Float /
    // null keys round-trip exactly.
    val outRows = keys.indices.flatMap { gid =>
      if (specs.indices.exists(i => targets(i)(gid).isEmpty)) None
      else Some(Row.fromSeq(keys(gid) +: specs.indices.flatMap { i =>
        targets(i)(gid).sortBy(_.j).map { t =>
          val vLo = resolved((i, gid, t.rank))
          val vHi = if (t.frac == 0.0) vLo else resolved((i, gid, t.rank + 1))
          vLo + (vHi - vLo) * t.frac
        }
      }))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq, 1),
      StructType(keyField +:
        specs.flatMap(_.outNames).map(n => StructField(n, DoubleType))))
  }

  /** Per-group DISCRETE median and MAD (median absolute deviation) of
    * `valueCol`, plus the count of rows beyond `outlierK` x MAD — the
    * robust-dispersion trio in the FEWEST possible passes: both
    * ladders and the fence count share ONE cached 2-column projection
    * and ONE stats job. The deviation lane starts with DERIVED bounds
    * (dev in [0, max(hi - med, med - lo)] — exactness never needs
    * tight bounds, only coverage) so it pays no stats pass, and its
    * values fold lazily per round as |v - median(group)| through the
    * cluster table's shift column — the deviation column is never
    * materialized or re-joined. Output: (groupCol, med, mad,
    * n_outliers) with med/mad as actual data values (doubles).
    */
  def medianMadDiscrete(
      df: DataFrame, groupCol: String, valueCol: String, outlierK: Double,
      nBuckets: Int = 8192, maxCollect: Int = 1 << 18): DataFrame = {
    val spark = df.sparkSession
    val keyField = df.schema(groupCol)
    val rows = df.select(col(groupCol).as("__g"),
      col(valueCol).cast("double").as("__v0"))
      .filter(col("__v0").isNotNull)
      .persist()
    val statRows = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), min(col("__v0")).as("lo"),
        max(col("__v0")).as("hi")).collect()
    val keys: Array[Any] = statRows.map(_.get(0))
    val stats: Array[(Long, Double, Double)] =
      statRows.map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // Discrete median rank: smallest value with cume_dist >= 0.5.
    val medRank: Array[Long] =
      stats.map { case (n, _, _) => math.max(0L, math.ceil(0.5 * n).toLong - 1L) }

    val laneV = Lane(0, None, stats.map(Option(_)), medRank.map(Seq(_)))
    val resV = resolveRanks(rows, keyField.dataType, keys, Seq(laneV), 1,
      nBuckets, maxCollect)
    val med: Array[Double] =
      keys.indices.map(g => resV((0, g, medRank(g)))).toArray

    val devBounds: Array[Option[(Long, Double, Double)]] =
      stats.zipWithIndex.map { case ((n, lo, hi), g) =>
        Some((n, 0.0, math.max(hi - med(g), med(g) - lo)))
      }
    val laneD = Lane(0, Some(med), devBounds, medRank.map(Seq(_)))
    val resD = resolveRanks(rows, keyField.dataType, keys, Seq(laneD), 1,
      nBuckets, maxCollect)
    val mad: Array[Double] =
      keys.indices.map(g => resD((0, g, medRank(g)))).toArray

    // Outlier fence: ONE partial-agg job over the same cached rows —
    // |v - med| > k * mad, all integers exact in double here.
    val fence = spark.createDataFrame(
      spark.sparkContext.parallelize(keys.indices.map(g =>
        Row(keys(g), med(g), mad(g))).toSeq, 1),
      StructType(Seq(
        StructField("__fk", keyField.dataType, nullable = true),
        StructField("__med", DoubleType, nullable = false),
        StructField("__mad", DoubleType, nullable = false))))
    val outliers: Map[Int, Long] = {
      val byKey = rows.join(broadcast(fence), col("__g") <=> col("__fk"))
        .groupBy(col("__g"))
        .agg(sum(when(
          abs(col("__v0") - col("__med")) > lit(outlierK) * col("__mad"), 1L)
          .otherwise(0L)).as("__n"))
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      keys.indices.map(g => g -> byKey.getOrElse(keys(g), 0L)).toMap
    }
    rows.unpersist(false)

    spark.createDataFrame(
      spark.sparkContext.parallelize(keys.indices.map(g =>
        Row(keys(g), med(g), mad(g), outliers(g))).toSeq, 1),
      StructType(Seq(keyField,
        StructField("med", DoubleType, nullable = true),
        StructField("mad", DoubleType, nullable = true),
        StructField("n_outliers", LongType, nullable = true))))
  }

  // ------------------------------------------- shared narrowing engine

  /** One target order statistic: output slot `j`, 0-based `rank`, and
    * its type-7 interpolation fraction (0 for discrete/nearest-rank).
    */
  private case class Target(j: Int, rank: Long, frac: Double)

  private def targetsFor(
      n: Long, ps: Seq[Double], discrete: Boolean): Seq[Target] =
    ps.zipWithIndex.map { case (p, j) =>
      if (discrete) Target(j, math.max(0L, math.ceil(p * n).toLong - 1L), 0.0)
      else {
        val pos = p * (n - 1)
        Target(j, math.floor(pos).toLong, pos - math.floor(pos))
      }
    }

  /** A narrowing lane: value column `__v<vIdx>` of the projected rows,
    * optionally folded per group to |v - shift(gid)| (the MAD lane);
    * `bounds(gid)` = (n, lo, hi) where lo/hi are ANY values bracketing
    * the lane's group data (actual min/max or derived bounds — the
    * resolution is by rank against actual bucket contents, so
    * exactness never depends on tight bounds, only on coverage);
    * `needed(gid)` = the 0-based ranks to resolve.
    */
  private case class Lane(
      vIdx: Int, shift: Option[Array[Double]],
      bounds: Array[Option[(Long, Double, Double)]],
      needed: Array[Seq[Long]])

  /** One cluster: a contiguous run of unresolved ranks of one (lane,
    * group); its rows are exactly { group == key(gid) && lo <= v <= hi }
    * in the lane's (possibly shifted) value domain; `base` = group rows
    * ranked strictly below it.
    */
  private case class St(
      lane: Int, gid: Int, ranks: Seq[Long],
      base: Long, cnt: Long, lo: Double, hi: Double)

  /** The shared histogram-narrowing loop over every lane's clusters at
    * once: per round ONE histogram job across all oversized clusters
    * and ONE bounded collect across all small ones, exactly the
    * round structure of the original single-lane loop (the bucket
    * expression is monotone and deterministic per value, keeping
    * `base` exact under FP bucket-edge wobble; buckets where
    * min == max resolve exactly, terminating duplicate floods).
    * Returns (laneIdx, gid, rank) -> value.
    */
  private def resolveRanks(
      rows: DataFrame, keyType: org.apache.spark.sql.types.DataType,
      keys: Array[Any], lanes: Seq[Lane], nLaneCols: Int,
      nBuckets: Int, maxCollect: Int)
      : scala.collection.Map[(Int, Int, Long), Double] = {
    val spark = rows.sparkSession
    var live: List[St] = lanes.zipWithIndex.toList.flatMap { case (ln, li) =>
      keys.indices.flatMap { gid =>
        ln.bounds(gid)
          .filter(_ => ln.needed(gid).nonEmpty)
          .map { case (n, lo, hi) => St(li, gid, ln.needed(gid), 0L, n, lo, hi) }
      }
    }
    val resolved = scala.collection.mutable.Map.empty[(Int, Int, Long), Double]

    def clusterDf(cs: Seq[(St, Int)]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(cs.map { case (s, cid) =>
          Row(cid, keys(s.gid), s.lo, s.hi, s.lane,
            lanes(s.lane).shift
              .map(sh => java.lang.Double.valueOf(sh(s.gid))).orNull)
        }.toSeq, 1),
        StructType(Seq(
          StructField("__cid", IntegerType, nullable = false),
          StructField("__gk", keyType, nullable = true),
          StructField("__lo", DoubleType, nullable = false),
          StructField("__hi", DoubleType, nullable = false),
          StructField("__vc", IntegerType, nullable = false),
          StructField("__sh", DoubleType, nullable = true))))

    // Membership: null-safe equi-join on the group key (a broadcast
    // hash join) with the cluster's closed value range — in the lane's
    // effective domain — as the join filter. A null raw value nulls
    // the range predicate and drops out, matching the per-lane
    // non-null population.
    def memberRows(cs: Seq[(St, Int)]): DataFrame = {
      val raw = (0 until nLaneCols)
        .foldLeft(lit(null).cast(DoubleType): org.apache.spark.sql.Column) {
          case (acc, i) => when(col("__vc") === i, col(s"__v$i")).otherwise(acc)
        }
      val vEff = when(col("__sh").isNotNull, abs(raw - col("__sh"))).otherwise(raw)
      rows.join(broadcast(clusterDf(cs)),
        col("__g") <=> col("__gk") && vEff >= col("__lo") && vEff <= col("__hi"))
        .select(col("__cid"), vEff.as("__v"), col("__lo"), col("__hi"))
    }

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
          s.ranks.foreach(r => resolved((s.lane, s.gid, r)) = vs((r - s.base).toInt))
        }
      }

      live = if (big.isEmpty) Nil
      else {
        // ONE histogram job across every oversized cluster of every lane.
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
            if (mn == mx) { resolved((s.lane, s.gid, r)) = mn; false } else true
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
            St(s.lane, s.gid, run.flatMap(byBucket.getOrElse(_, Nil)).sorted,
              cum(bLo), (bLo to bHi).map(counts(_)).sum,
              run.map(b => hist(b)._2).min, run.map(b => hist(b)._3).max)
          }
        }
      }
    }
    require(live.isEmpty,
      s"histogram percentile did not converge in $rounds rounds")
    resolved
  }
}
