package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ordering without a single-task window.
  *
  * The invariants of the two-pass rank pattern live in ONE place:
  *  - `repartitionByRange` must use exactly the rank's sort columns, so
  *    every partition holds a contiguous key range and partition order
  *    IS global order (true for any sampled boundaries);
  *  - the partition-local sort must use the same columns;
  *  - `zipWithIndex` then assigns global indices with one extra
  *    per-partition count pass — no task ever sorts more than
  *    1/numPartitions of the data.
  * Callers turning the index into a per-group rank must subtract
  * per-group offsets whose ordering matches the leading sort column's
  * partitioner ordering (for strings: UTF8 binary order — equal to
  * JVM lexicographic order only for ASCII keys).
  */
object Ranks {

  /** The input's columns plus a 0-based global index column over the
    * total order defined by `sortCols` (which must be a total order —
    * include a unique tiebreaker).
    */
  def withGlobalIndex(
      df: DataFrame, sortCols: Seq[Column], idxCol: String,
      numPartitions: Int = 32): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idxCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** The input's columns plus an EXCLUSIVE running total of `valueCol`
    * (a long) over the total order defined by `sortCols` — the
    * distributed prefix-sum (scan) primitive.
    *
    * Same shape as [[withGlobalIndex]]: range-partition on the sort
    * columns so partition order IS global order, one lightweight pass
    * summing each partition (O(numPartitions) driver rows — the same
    * bounded-collect budget class as zipWithIndex's count pass), then a
    * partition-local scan seeded with the broadcast prefix offsets. No
    * task ever holds more than 1/numPartitions of the rows, vs a
    * single-task unpartitioned running-sum window.
    */
  def withRunningTotal(
      df: DataFrame, sortCols: Seq[Column], valueCol: String, totalCol: String,
      numPartitions: Int = 32): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    val field = sorted.schema.fields(valueIdx)
    require(field.dataType == LongType && !field.nullable,
      s"withRunningTotal needs a non-null LongType value column, " +
        s"got ${field.dataType} (nullable=${field.nullable}) for '$valueCol'")
    // The sorted rows feed two passes (per-partition totals, then the
    // seeded scan). MEMORY_AND_DISK, not cache(): MEMORY_ONLY would
    // silently drop partitions under pressure at corpus scale and
    // recompute the range-partition sort per pass.
    val rdd0 = sorted.rdd
    rdd0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perPart = rdd0
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(valueIdx)
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = perPart.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val schema = StructType(
      sorted.schema.fields :+ StructField(totalCol, LongType, nullable = false))
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(valueIdx)
        out
      }
    }
    // Eagerly materialize the scan output, then RELEASE the persisted
    // input — without this every invocation leaks a cached RDD for the
    // session's lifetime (the d13/d17 localCheckpoint pattern).
    val res = df.sparkSession.createDataFrame(rdd, schema).localCheckpoint(true)
    rdd0.unpersist(false)
    res
  }
}
