package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join (an operator Spark SQL lacks natively).
  *
  * Semantics: for each left row, attach `payload` from the right row
  * with the greatest `rightTime <= leftTime` sharing the join key
  * (DuckDB `ASOF JOIN` with `l.t >= r.t`); left rows with no match keep
  * null payload (left-join semantics).
  *
  * Implementation is the scalable union/last_value trick rather than an
  * inequality join: tag both sides, union them into one timeline,
  * shuffle ONCE on the key, sort each partition by (time, side), and
  * forward-fill the right payload with `last(ignoreNulls)` over an
  * unbounded-preceding running window. At equal timestamps right rows
  * sort before left rows so the match is inclusive (>=).
  *
  * Scale: one shuffle + partition-local sort — same cost shape as a
  * sort-merge join; no O(|L|x|R|) inequality-join explosion, no
  * broadcast requirement. Skewed keys are handled by AQE.
  *
  * Caveats: right should be unique per (key, time) — pre-aggregate
  * otherwise (ties are resolved by union order, not a defined rule).
  * With multiple payload columns, nulls inside right payload columns
  * forward-fill independently.
  */
object AsOfJoin {
  /** @param toleranceUs optional lookback bound in microseconds: a
    *   right row only matches while `leftTime - rightTime <=
    *   toleranceUs` (pandas merge_asof semantics). None = unbounded.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols)} clash with left columns")

    val lTagged = payload.foldLeft(
      left
        .withColumn("__k", col(leftKey))
        .withColumn("__t", col(leftTime))
        .withColumn("__isR", lit(0))) { (df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val rTagged = leftCols.foldLeft(
      right
        // Null keys never match in join/ASOF semantics; dropping them
        // here keeps null-key left rows from being forward-filled by
        // null-key right rows sharing the window partition.
        .filter(col(rightKey).isNotNull)
        .withColumn("__k", col(rightKey).cast(left.schema(leftKey).dataType))
        .withColumn("__t", col(rightTime).cast(left.schema(leftTime).dataType))
        .withColumn("__isR", lit(1))
        .select((Seq("__k", "__t", "__isR") ++ payload).map(col): _*)) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val ordered: Seq[Column] = (leftCols ++ payload ++ Seq("__k", "__t", "__isR")).map(col)
    val timeline = lTagged.select(ordered: _*).union(rTagged.select(ordered: _*))

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Forward-fill the matched right row's own time alongside the
    // payload so a tolerance bound can be applied afterwards.
    val withRt = timeline.withColumn("__rt",
      when(col("__isR") === 1, col("__t")).otherwise(lit(null).cast(timeline.schema("__t").dataType)))
    val filled = (payload :+ "__rt").foldLeft(withRt) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    val bounded = toleranceUs match {
      case None => filled
      case Some(tol) =>
        // Tolerance units: micros for timestamp time columns, the raw
        // column units for integral ones. Casting an integral to
        // timestamp would interpret it as SECONDS and misscale the
        // bound by 1e6, so branch on the type instead.
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
        val diff = filled.schema("__t").dataType match {
          case TimestampType | TimestampNTZType =>
            unix_micros(col("__t").cast("timestamp")) -
              unix_micros(col("__rt").cast("timestamp"))
          case ByteType | ShortType | IntegerType | LongType =>
            col("__t").cast("long") - col("__rt").cast("long")
          case other => throw new IllegalArgumentException(
            s"toleranceUs needs a timestamp or integral time column, got $other")
        }
        val inRange = col("__rt").isNotNull && diff <= tol
        payload.foldLeft(filled) { (df, p) =>
          df.withColumn(p, when(inRange, col(p)).otherwise(lit(null).cast(right.schema(p).dataType)))
        }
    }
    bounded.filter(col("__isR") === 0).select((leftCols ++ payload).map(col): _*)
  }

  /** Native-operator variant: plans as [[graft.plans.AsOfJoinExec]]
    * (custom LogicalPlan -> Strategy -> SparkPlan, registered via
    * GraftExtensions — requires an Engine.session). Same semantics as
    * [[asOf]], incl. the optional tolerance bound; a per-partition
    * two-pointer merge instead of union + window.
    */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.IsNotNull
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payload.intersect(left.columns.toSeq)} clash with left columns")
    toleranceUs.foreach { _ =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
      left.schema(leftTime).dataType match {
        case TimestampType | TimestampNTZType => () // physical micros
        case ByteType | ShortType | IntegerType | LongType => () // raw column units
        case other => throw new IllegalArgumentException(
          s"toleranceUs needs a timestamp or integral time column, got $other")
      }
    }
    // Align right key/time types to the left side (e.g. parquet
    // TIMESTAMP_NTZ vs session-tz TIMESTAMP), as the union form does.
    val rightAligned = Seq(rightKey -> leftKey, rightTime -> leftTime)
      .foldLeft(right) { case (df, (rc, lc)) =>
        if (df.schema(rc).dataType == left.schema(lc).dataType) df
        else df.withColumn(rc, col(rc).cast(left.schema(lc).dataType))
      }
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = rightAligned.queryExecution.analyzed
    def attrOf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${plan.output.map(_.name)}"))
    val rk = attrOf(rPlan0, rightKey)
    val rPlan = Filter(IsNotNull(rk), rPlan0)
    GraftBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(
        lPlan, rPlan,
        attrOf(lPlan, leftKey), rk,
        attrOf(lPlan, leftTime), attrOf(rPlan0, rightTime),
        payload.map(attrOf(rPlan0, _)),
        toleranceUs))
  }
}
