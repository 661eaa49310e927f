package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al.) heavy-hitters buffer: at most
  * `capacity` (item -> count, error) entries. A new item beyond
  * capacity evicts the current minimum-count entry and inherits its
  * count (+1) with error = that count — the classic bound
  * `true_count <= est <= true_count + error`, error <= n/capacity.
  *
  * EXACT below capacity (same contract as [[QuantileSketchBuffer]]):
  * while distinct items <= capacity nothing is ever evicted, every
  * error is 0, and counts are exact regardless of merge order — the
  * regime the q52 oracle hash-compares. Beyond capacity the estimate
  * degrades to the SpaceSaving bound (spec-checked) with O(capacity)
  * state instead of the O(distinct) hash map an exact count needs per
  * group — at 100 TB the difference between a bounded sketch and an
  * unbounded shuffle key space.
  *
  * All tie-breaks (eviction victim, truncation order) order by
  * (count, error, item) so a shuffled/merged buffer evolves exactly
  * like an in-memory one — determinism is what makes the exact regime
  * oracle-able.
  */
final class FrequentItemsBuffer(val capacity: Int) {
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  private def evictMin(): (String, (Long, Long)) = {
    val victim = counts.minBy { case (item, (c, e)) => (c, e, item) }
    counts -= victim._1
    victim
  }

  def insert(item: String): Unit = counts.get(item) match {
    case Some((c, e)) => counts(item) = (c + 1, e)
    case None if counts.size < capacity => counts(item) = (1L, 0L)
    case None =>
      val (_, (minC, _)) = evictMin()
      counts(item) = (minC + 1, minC)
  }

  /** Mergeable-summaries merge (Agarwal et al.): an item ABSENT from a
    * full summary may still have occurred up to that summary's minimum
    * count times (the SpaceSaving invariant), so absent items are
    * charged the min as both estimate and error — never adding the
    * floor would UNDERestimate after truncation, breaking the
    * `true <= est` guarantee the top-k relies on. A summary still below
    * capacity has seen every one of its items, so its floor is 0 (and
    * merges of exact summaries stay exact). After summing, truncate
    * back to the capacity-largest estimates; survivors dominate every
    * discarded count, so the invariant carries to the next merge.
    */
  def mergeIn(other: FrequentItemsBuffer): Unit = {
    val floorSelf =
      if (counts.size < capacity) 0L else counts.valuesIterator.map(_._1).min
    val floorOther =
      if (other.counts.size < capacity) 0L
      else other.counts.valuesIterator.map(_._1).min
    val keys = counts.keySet ++ other.counts.keySet
    val merged = keys.toSeq.map { k =>
      val (cA, eA) = counts.getOrElse(k, (floorSelf, floorSelf))
      val (cB, eB) = other.counts.getOrElse(k, (floorOther, floorOther))
      k -> (cA + cB, eA + eB)
    }
    counts.clear()
    counts ++= (if (merged.size <= capacity) merged
      else merged.sortBy { case (k, (c, e)) => (-c, e, k) }.take(capacity))
  }

  /** True while no eviction has ever contributed error. */
  def isExact: Boolean = counts.valuesIterator.forall(_._2 == 0L)

  /** Top-k (item, est_count) best-first, ties lexicographic. */
  def topK(k: Int): Seq[(String, Long)] =
    counts.toSeq.map { case (item, (c, _)) => (item, c) }
      .sortBy { case (item, c) => (-c, item) }
      .take(k)
}

/** Aggregate wrapper: `graft_heavy_hitters(col, k, capacity)` →
  * array<struct<item string, cnt long>> of the k most frequent values,
  * best-first. Map-side partial merge through the standard
  * TypedImperativeAggregate machinery — shuffle carries O(capacity)
  * entries per partition, never the value-distinct key space.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    capacity: Int = FrequentItems.DefaultCapacity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FrequentItemsBuffer] {

  require(k >= 1, "k must be >= 1")
  require(capacity >= k, "capacity must be >= k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType}")
  }

  override def createAggregationBuffer(): FrequentItemsBuffer =
    new FrequentItemsBuffer(capacity)

  override def update(buf: FrequentItemsBuffer, input: InternalRow): FrequentItemsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FrequentItemsBuffer, other: FrequentItemsBuffer): FrequentItemsBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: FrequentItemsBuffer): Any =
    new GenericArrayData(buf.topK(k).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])

  override def serialize(buf: FrequentItemsBuffer): Array[Byte] = {
    val entries = buf.counts.toSeq.map { case (item, (c, e)) =>
      (item.getBytes(StandardCharsets.UTF_8), c, e)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 20).sum)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c, e) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FrequentItemsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FrequentItemsBuffer(capacity)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts(new String(b, StandardCharsets.UTF_8)) = (bb.getLong, bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(child = newChildren(0))
}

object FrequentItems {
  val DefaultCapacity = 1024
}
