package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Fixed-size Bloom filter over a long column, built distributively:
  * partials set bits locally and merge by bitwise OR — commutative and
  * associative, so the final bit array is BYTE-DETERMINISTIC under any
  * partitioning/merge order (what lets the lake store it as immutable
  * per-file-set metadata).
  *
  * Double hashing (Kirsch–Mitzenmacher): bit_i = h1 + i*h2 over a
  * power-of-two bit space, with splitmix64-finalized h1/h2 — k probes
  * from two hashes, the standard Bloom construction. False positives
  * only ever cause an EXTRA file-set read, never a miss: membership
  * "no" is exact, which is the soundness the pruning path relies on.
  */
object GraftBloom {
  val DefaultK = 7

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Words (64-bit) for ~10 bits/key rounded up to a power of two —
    * <1% false positives at k=7.
    */
  def wordsFor(expectedKeys: Long): Int = {
    val bits = math.max(64L, expectedKeys * 10L)
    var w = 1
    while (w.toLong * 64 < bits && w < (1 << 24)) w <<= 1
    w
  }

  def setBits(words: Array[Long], k: Int, x: Long): Unit = {
    val mask = words.length.toLong * 64 - 1 // length is a power of two
    val h1 = mix(x)
    val h2 = mix(x ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) & mask
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def mightContain(words: Array[Long], k: Int, x: Long): Boolean = {
    val mask = words.length.toLong * 64 - 1
    val h1 = mix(x)
    val h2 = mix(x ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** `graft_bloom_agg(col, numWords, k)` → binary: the packed bit words.
  * O(numWords) state per partition regardless of row count; shuffle
  * carries one buffer per partition (map-side partial), so building a
  * bloom over a 100 TB file-set is one aggregating pass.
  */
case class BloomAgg(
    child: Expression,
    numWords: Int,
    k: Int = GraftBloom.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numWords > 0 && (numWords & (numWords - 1)) == 0,
    "numWords must be a positive power of two")
  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a long column, got ${child.dataType}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) GraftBloom.setBits(buf, k, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = GraftBloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = GraftBloom.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    GraftBloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
