package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable KLL-style quantile sketch buffer: a ladder of capacity-
  * bounded levels where level i holds values of weight 2^i. When a
  * level overflows, it is sorted and every second element is promoted
  * to the next level (deterministic alternation — reproducible, no
  * RNG), halving the item count while preserving ranks to within the
  * promoted weight.
  *
  * EXACT below capacity: while total input count <= capacity, no
  * compaction happens and quantiles are exact type-7 (linear
  * interpolation) order statistics — independent of merge order, which
  * is what lets a driver oracle hash-compare the gated query. Beyond
  * capacity the sketch degrades gracefully to bounded rank error
  * (spec-checked), with O(capacity x log(n/capacity)) state instead of
  * the O(n) per-group buffer exact percentile needs — the difference
  * between a bounded sketch and an unbounded sort at 100 TB.
  */
final class QuantileSketchBuffer(val capacity: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  // Keep-even/keep-odd alternation state; must survive serialization so
  // a shuffled buffer compacts identically to an in-memory one.
  var parity = 0

  def insert(v: Double): Unit = {
    levels(0) += v
    // strictly-greater trigger: a group of exactly `capacity` values
    // stays uncompacted, keeping the documented "exact while
    // n <= capacity" contract the q38 oracle relies on
    if (levels(0).length > capacity) compact(0)
  }

  private def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val sorted = levels(i).sortInPlace()
    val keepFrom = parity
    parity = 1 - parity
    var j = keepFrom
    while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
    levels(i).clear()
    if (levels(i + 1).length > capacity) compact(i + 1)
  }

  def mergeIn(other: QuantileSketchBuffer): Unit = {
    var i = 0
    while (i < other.levels.length) {
      while (levels.length <= i) levels += ArrayBuffer.empty[Double]
      levels(i) ++= other.levels(i)
      if (levels(i).length > capacity) compact(i)
      i += 1
    }
  }

  def totalWeight: Long =
    levels.zipWithIndex.map { case (l, i) => l.length.toLong << i }.sum

  /** True while no compaction has occurred (all weight at level 0). */
  def isExact: Boolean = levels.length == 1 || levels.drop(1).forall(_.isEmpty)

  /** Quantiles at the given fractions. Exact regime: type-7 linear
    * interpolation (matches SQL percentile / quantile_cont). Sketch
    * regime: weighted nearest-rank over (value, weight) pairs.
    */
  def quantiles(ps: Seq[Double]): Seq[Double] = {
    if (isExact) {
      val v = levels(0).toArray.sorted
      ps.map { p =>
        if (v.isEmpty) Double.NaN
        else {
          val pos = p * (v.length - 1)
          val lo = math.floor(pos).toInt
          val hi = math.ceil(pos).toInt
          if (lo == hi) v(lo)
          else v(lo) * (hi - pos) + v(hi) * (pos - lo)
        }
      }
    } else {
      val weighted = levels.zipWithIndex
        .flatMap { case (l, i) => l.map(v => (v, 1L << i)) }
        .sortBy(_._1)
      val total = weighted.map(_._2).sum
      ps.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var acc = 0L
        var k = 0
        while (k < weighted.length && acc + weighted(k)._2 < target) {
          acc += weighted(k)._2; k += 1
        }
        weighted(math.min(k, weighted.length - 1))._1
      }
    }
  }
}

/** Aggregate wrapper: `graft_quantile_sketch(col, array(p1, p2, ...))`
  * → array<double> of the requested quantiles. Map-side partial merge
  * through the standard TypedImperativeAggregate machinery.
  */
case class QuantileSketch(
    child: Expression,
    percentages: Seq[Double],
    capacity: Int = QuantileSketch.DefaultCapacity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchBuffer] {

  require(capacity >= 8, "capacity must be >= 8")
  require(percentages.forall(p => p >= 0.0 && p <= 1.0), "percentages in [0,1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_quantile_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double column, got ${child.dataType}")
  }

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer(capacity)

  override def update(buf: QuantileSketchBuffer, input: InternalRow): QuantileSketchBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileSketchBuffer, other: QuantileSketchBuffer): QuantileSketchBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: QuantileSketchBuffer): Any =
    new GenericArrayData(buf.quantiles(percentages).toArray)

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] = {
    val n = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(8 + buf.levels.length * 4 + n * 8)
    bb.putInt(buf.parity)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QuantileSketchBuffer(capacity)
    buf.parity = bb.getInt
    val nLevels = bb.getInt
    (0 until nLevels).foreach { i =>
      while (buf.levels.length <= i) buf.levels += ArrayBuffer.empty[Double]
      val n = bb.getInt
      (0 until n).foreach(_ => buf.levels(i) += bb.getDouble)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren(0))
}

object QuantileSketch {
  val DefaultCapacity = 4096
}
