package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.AsOfJoin

/** Randomized-property checks of the custom operators against
  * brute-force reference implementations (fixed seeds — reproducible).
  */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  test("AsOfJoin matches brute-force latest-at-or-before semantics on random data") {
    import spark.implicits._
    (1 to 6).foreach { trial =>
      val rnd = new Random(1000 + trial)
      val ls = List.fill(40)((rnd.nextInt(5).toLong, rnd.nextInt(600)))
      val rs = List.fill(25)((rnd.nextInt(5).toLong, rnd.nextInt(600))).distinct

      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("event_id", "k", "t")
      val right = rs.map { case (k, t) => (k, ts(t), k * 10000L + t) }
        .toDF("rk", "rt", "payload")

      val got = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("payload")).map(_.toLong))
        .toMap

      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter { case (rk, rt) => rk == k && rt <= t }
        i.toLong -> (if (cands.isEmpty) None
                     else {
                       val (bk, bt) = cands.maxBy(_._2)
                       Some(bk * 10000L + bt)
                     })
      }.toMap

      assert(got == want, s"trial $trial")
    }
  }

  test("native AsOfJoinExec matches the union/window implementation on random data") {
    import spark.implicits._
    (1 to 6).foreach { trial =>
      val rnd = new Random(3000 + trial)
      val ls = List.fill(50)((rnd.nextInt(6).toLong, rnd.nextInt(600)))
      val rs = List.fill(30)((rnd.nextInt(6).toLong, rnd.nextInt(600))).distinct

      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("event_id", "k", "t")
      val right = rs.map { case (k, t) => (k, ts(t), k * 10000L + t) }
        .toDF("rk", "rt", "payload")

      val native = AsOfJoin.asOfNative(left, right, "k", "rk", "t", "rt", Seq("payload"))
      assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        "expected the custom exec in the plan")
      val gotN = native.collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("payload")).map(_.toLong)).toMap
      val gotU = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("payload")).map(_.toLong)).toMap
      assert(gotN == gotU, s"trial $trial")
    }
  }

  test("native AsOfJoinExec matches union/window form under a tolerance bound") {
    import spark.implicits._
    (1 to 6).foreach { trial =>
      val rnd = new Random(4000 + trial)
      val ls = List.fill(50)((rnd.nextInt(6).toLong, rnd.nextInt(600)))
      val rs = List.fill(30)((rnd.nextInt(6).toLong, rnd.nextInt(600))).distinct
      val tol = Some((rnd.nextInt(120) + 1) * 60L * 1000000L) // 1..120 min in us

      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("event_id", "k", "t")
      val right = rs.map { case (k, t) => (k, ts(t), k * 10000L + t) }
        .toDF("rk", "rt", "payload")

      def res(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("payload")).map(_.toLong)).toMap
      val gotN = res(AsOfJoin.asOfNative(left, right, "k", "rk", "t", "rt", Seq("payload"), tol))
      val gotU = res(AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"), tol))
      assert(gotN == gotU, s"trial $trial tol=$tol")
    }
  }

  test("connected-component canonicalization matches union-find on random graphs") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val rnd = new Random(7000 + trial)
      val n = 60
      val edges = List.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct

      // brute union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap

      // Both execution paths must agree with the reference: the
      // driver union-find (default cutoff) and the distributed label
      // propagation (forced with a zero cutoff).
      Seq(graft.operators.Dedup.DriverCCEdgeLimit, 0L).foreach { cutoff =>
        val got = graft.operators.Dedup.canonicalizeComponents(
          (0L until n.toLong).toDF("id"),
          edges.toDF("a", "b"), driverEdgeLimit = cutoff)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial cutoff $cutoff")
      }
    }
  }

  test("CC driver-edge cutoff derives from heap size within its floor/cap band") {
    val lim = graft.operators.Dedup.DriverCCEdgeLimit
    assert(lim >= 500000L && lim <= 8000000L)
    // ~200 bytes/edge at ≤10% of heap — the documented derivation.
    val derived = Runtime.getRuntime.maxMemory() / 2000L
    assert(lim == math.min(8000000L, math.max(500000L, derived)))
  }

  test("CC collapses a 100-deep chain within the pointer-jumping round bound") {
    import spark.implicits._
    // Path graph 0-1-2-...-100: worst-case diameter for label
    // propagation. With the neighbor step + pointer jumping the chain
    // depth roughly halves per round, so maxIters=15 (2^14 bound) must
    // comfortably converge — and every node must land on canonical 0.
    val n = 101L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    // Forced onto the ITERATIVE path: the chain-depth bound is the
    // label-propagation property under test.
    val got = graft.operators.Dedup.canonicalizeComponents(
      (0L until n).toDF("id"), edges, driverEdgeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), s"chain not fully collapsed: ${got.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("QuantileSketch serialize/deserialize round-trips the buffer") {
    val rnd = new Random(17)
    val buf = new graft.plans.QuantileSketchBuffer(64)
    (1 to 1000).foreach(_ => buf.insert(rnd.nextDouble() * 100))
    val agg = graft.plans.QuantileSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), Seq(0.5), 64)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.quantiles(Seq(0.1, 0.5, 0.9)) == buf.quantiles(Seq(0.1, 0.5, 0.9)))
    assert(back.totalWeight == buf.totalWeight)
  }

  test("TopKByScore matches sort-take reference on random scores (incl. ties)") {
    import spark.implicits._
    (1 to 6).foreach { trial =>
      val rnd = new Random(2000 + trial)
      // Coarse scores + distinct ids per group: frequent score ties,
      // unambiguous (score desc, id asc) reference order.
      val rows = (0 until 3).flatMap { g =>
        rnd.shuffle((0L until 300L).toList).take(40)
          .map(id => (g.toLong, id, rnd.nextInt(50) / 10.0))
      }

      val got = rows.toDF("g", "id", "s")
        .groupBy("g")
        .agg(VectorFunctions.topKByScore(col("s"), col("id"), 5).as("tk"))
        .select(col("g"), explode(col("tk")).as("e"))
        .select(col("g"), col("e.id"), col("e.score"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

      val want = rows.groupBy(_._1).view.mapValues { grp =>
        grp.map { case (_, id, s) => (s, id) }
          .sortBy { case (s, id) => (-s, id) }
          .take(5).map { case (s, id) => (id, s) }.toSeq
      }.toMap

      got.foreach { case (g, pairs) =>
        assert(pairs == want(g), s"trial $trial group $g: $pairs vs ${want(g)}")
      }
    }
  }

  test("withRunningTotal matches a sequential scan on random sizes and partition counts") {
    import spark.implicits._
    val rnd = new Random(31)
    // Sizes below/at/above partition counts exercise empty range
    // partitions and single-row partitions in the offset arithmetic.
    Seq((0, 4), (1, 4), (3, 8), (100, 7), (1000, 32)).foreach { case (n, parts) =>
      val rows = Seq.tabulate(n)(i => (i.toLong, rnd.nextInt(1000).toLong))
      val df = rows.toDF("k", "v").repartition(5) // scrambled input partitioning
      val got = graft.operators.Ranks
        .withRunningTotal(df, Seq(col("k")), "v", "run", numPartitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
      var acc = 0L
      val expected = rows.sortBy(_._1).map { case (k, v) =>
        val out = (k, acc); acc += v; out
      }
      assert(got == expected, s"n=$n parts=$parts")
    }
  }

  test("FrequentItems exact regime is merge-order invariant") {
    import graft.plans.FrequentItemsBuffer
    val rnd = new Random(37)
    val items = Seq.fill(2000)(s"w${rnd.nextInt(50)}") // 50 distinct < capacity
    val chunks = items.grouped(250).toSeq
    def mergedIn(order: Seq[Int]): Seq[(String, Long)] = {
      val bufs = chunks.map { c =>
        val b = new FrequentItemsBuffer(64); c.foreach(b.insert); b
      }
      val acc = new FrequentItemsBuffer(64)
      order.foreach(i => acc.mergeIn(bufs(i)))
      acc.topK(10)
    }
    val forward = mergedIn(chunks.indices)
    val backward = mergedIn(chunks.indices.reverse)
    val shuffled = mergedIn(rnd.shuffle(chunks.indices.toList))
    assert(forward == backward && forward == shuffled)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10)
    assert(forward == truth)
  }
}
