package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.plans.QuantileSketchBuffer

class SketchSpec extends AnyFunSuite with SparkSpec {

  test("quantile sketch is exact below capacity, across partition merges") {
    import spark.implicits._
    val rnd = new Random(5)
    val vals = Seq.fill(3000)(rnd.nextDouble() * 1000 - 200)
    // 8 partitions force partial buffers + serialize/merge on the way
    // to the final aggregation.
    val df = vals.toDF("v").repartition(8)
      .agg(VectorFunctions.quantileSketch(col("v"), Seq(0.25, 0.5, 0.9)).as("qs"))
      .select(element_at(col("qs"), 1), element_at(col("qs"), 2), element_at(col("qs"), 3))
    val Array(q25, q50, q90) = df.collect().head.toSeq.map(_.asInstanceOf[Double]).toArray

    def exact(p: Double): Double = {
      val v = vals.sorted.toArray
      val pos = p * (v.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) v(lo) else v(lo) * (hi - pos) + v(hi) * (pos - lo)
    }
    assert(q25 == exact(0.25) && q50 == exact(0.5) && q90 == exact(0.9),
      s"sub-capacity sketch not exact: ($q25,$q50,$q90) vs (${exact(0.25)},${exact(0.5)},${exact(0.9)})")
  }

  test("compacted sketch keeps rank error within 3% at 50x capacity") {
    val rnd = new Random(9)
    val n = 25600
    val vals = Array.fill(n)(rnd.nextDouble())
    val buf = new QuantileSketchBuffer(512)
    vals.foreach(buf.insert)
    assert(!buf.isExact, "expected the sketch to have compacted")

    val sorted = vals.sorted
    Seq(0.1, 0.25, 0.5, 0.75, 0.9).foreach { p =>
      val est = buf.quantiles(Seq(p)).head
      // true rank of the estimate (fraction of values <= est)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - p) <= 0.03,
        f"p=$p: estimate $est%.4f has true rank $rank%.4f (err ${math.abs(rank - p)}%.4f)")
    }
  }

  test("sketch merge order does not change the exact-regime answer") {
    val rnd = new Random(13)
    val chunks = Seq.fill(6)(Array.fill(100)(rnd.nextDouble() * 50))
    def mergedQuantile(order: Seq[Int]): Double = {
      val target = new QuantileSketchBuffer(4096)
      order.foreach { i =>
        val b = new QuantileSketchBuffer(4096)
        chunks(i).foreach(b.insert)
        target.mergeIn(b)
      }
      target.quantiles(Seq(0.5)).head
    }
    val a = mergedQuantile(0 until 6)
    val b = mergedQuantile((0 until 6).reverse)
    assert(a == b)
  }

  test("serialize round-trip preserves compaction parity") {
    import graft.plans.QuantileSketch
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = QuantileSketch(Literal(0.0), Seq(0.5), capacity = 8)
    val rnd = new Random(21)
    val vals = Array.fill(64)(rnd.nextDouble())

    // In-memory run vs a run whose buffer round-trips through
    // serialize/deserialize mid-stream: identical keep-even/keep-odd
    // alternation requires the parity bit to survive the round-trip.
    val direct = new QuantileSketchBuffer(8)
    vals.foreach(direct.insert)

    var shuffled = new QuantileSketchBuffer(8)
    vals.zipWithIndex.foreach { case (v, i) =>
      shuffled.insert(v)
      if (i % 16 == 15) shuffled = agg.deserialize(agg.serialize(shuffled))
    }

    assert(shuffled.parity == direct.parity)
    assert(shuffled.levels.map(_.sorted.toSeq).toSeq ==
      direct.levels.map(_.sorted.toSeq).toSeq)
  }

  test("heavy hitters are exact below capacity, across partition merges") {
    import spark.implicits._
    val rnd = new Random(7)
    // Zipf-ish skew over 40 distinct items, capacity 64 > 40 -> exact.
    val items = Seq.fill(5000)(s"u${(math.pow(rnd.nextDouble(), 2) * 40).toInt}")
    val df = items.toDF("item").repartition(8)
      .agg(VectorFunctions.heavyHitters(col("item"), 10, 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (item, c) => (-c, item) }.take(10)
    assert(got == expected)
  }

  test("beyond capacity the SpaceSaving bound holds: est in [true, true + n/cap]") {
    import graft.plans.{FrequentItems, FrequentItemsBuffer}
    val rnd = new Random(11)
    // 400 distinct, capacity 64: heavily lossy, but the top of the
    // skewed distribution must survive with bounded overestimate.
    val items = Seq.fill(20000)(s"u${(math.pow(rnd.nextDouble(), 3) * 400).toInt}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // Split across 8 simulated partitions, merge via serialize round
    // trips (the distributed path).
    val agg = FrequentItems(
      org.apache.spark.sql.catalyst.expressions.Literal(""), 10, 64)
    val parts = items.grouped((items.size + 7) / 8).map { chunk =>
      val b = new FrequentItemsBuffer(64)
      chunk.foreach(b.insert)
      agg.deserialize(agg.serialize(b))
    }.toSeq
    val merged = parts.reduceLeft { (a, b) => a.mergeIn(b); a }

    val bound = items.size.toLong / 64 * 8 // per-partition error sums in the worst case
    merged.topK(10).foreach { case (item, est) =>
      val t = truth(item)
      assert(est >= t, s"$item: est $est underestimates true $t")
      assert(est <= t + bound, s"$item: est $est exceeds true $t + bound $bound")
    }
    // The heaviest true item must be found despite evictions.
    val trueTop = truth.toSeq.maxBy(x => (x._2, x._1))._1
    assert(merged.topK(10).map(_._1).contains(trueTop))
  }
}
