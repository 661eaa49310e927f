package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftLake

/** Randomized multi-writer stress over the claim/publish loop: N
  * writers each run a seeded-random mix of append / merge-upsert /
  * deleteKeys against DISJOINT id ranges, retrying on the loud
  * ConcurrentModificationException the commit protocol throws when a
  * rewrite races. Disjoint ranges make every interleaving
  * serializable to the same state, so the final table must equal the
  * union of each writer's sequentially-tracked expectation — plus a
  * gapless crc-verified log, no dangling set references, and a CDF
  * feed that replays to exactly the final state.
  */
class LakeStressSpec extends AnyFunSuite with SparkSpec {

  test("randomized multi-writer mix: serializable outcome, gapless log, consistent CDF") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-stress").resolve("t").toString
    GraftLake.create(Seq.empty[(Long, Long)].toDF("id", "v"), path, Some("id"))
    GraftLake.enableCdf(path)
    val nWriters = 4
    val opsPer = 5
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    def retryCme[T](f: => T): T = {
      var last: Throwable = null
      (0 until 50).foreach { _ =>
        try return f
        catch { case e: java.util.ConcurrentModificationException => last = e }
      }
      throw last
    }
    val results = Await.result(Future.sequence((0 until nWriters).map { w =>
      Future {
        val rnd = new scala.util.Random(1000 + w)
        val base = w * 100000L
        var next = 1L
        val state = scala.collection.mutable.Map[Long, Long]()
        def freshIds(n: Int): Seq[Long] = {
          val ids = (next until next + n).map(base + _); next += n; ids
        }
        (0 until opsPer).foreach { _ =>
          rnd.nextInt(3) match {
            case 1 if state.nonEmpty => // merge: double some, insert some
              val upd = rnd.shuffle(state.keys.toSeq).take(10)
              val ins = freshIds(5)
              val rows = upd.map(k => (k, state(k) * 2 + 1)) ++
                ins.map(i => (i, i * 10))
              retryCme(GraftLake.merge(spark, path,
                rows.toDF("id", "v"), Seq("id"), "id"))
              rows.foreach { case (k, v) => state(k) = v }
            case 2 if state.nonEmpty => // distributed key-set delete
              val del = rnd.shuffle(state.keys.toSeq).take(5)
              retryCme(GraftLake.deleteKeys(spark, path,
                del.toDF("id"), "id", Some("id")))
              del.foreach(state -= _)
            case _ => // append a fresh slice
              val ids = freshIds(20 + rnd.nextInt(10))
              val rows = ids.map(i => (i, i * 10))
              retryCme(GraftLake.append(rows.toDF("id", "v"), path,
                Some("id")))
              rows.foreach { case (k, v) => state(k) = v }
          }
        }
        state.toMap
      }
    }), 10.minutes)
    val expected = results.reduce(_ ++ _)
    def tableNow: Map[Long, Long] = GraftLake.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1. Serializable outcome: any interleaving must land exactly on
    //    the union of the writers' sequential expectations.
    assert(tableNow == expected)
    // 2. Gapless, crc-verified log (parse validates every seal).
    val vs = GraftLake.commits(path).map(_.version)
    assert(vs == (0 to vs.last).toSeq, s"log gaps: $vs")
    // 3. CDF consistency: the typed feed alone replays to the state.
    //    (Checked BEFORE vacuum — the feed reads historical sets that
    //    a zero-retention vacuum legitimately reclaims.)
    val feed = GraftLake.changesTyped(spark, path, -1).localCheckpoint(true)
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "update_preimage", 0).otherwise(1).desc)
    val mirror = feed.withColumn("_rn", row_number().over(win))
      .filter(col("_rn") === 1).filter(col("_change_type") =!= "delete")
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mirror == expected)
    // 4. No dangling references; vacuum reclaims only dead sets.
    GraftLake.snapshot(path).live.map(_.set).foreach(s0 =>
      assert(Files.exists(java.nio.file.Paths.get(path, s0)),
        s"dangling live set $s0"))
    GraftLake.vacuum(path, retainMillis = 0L)
    assert(tableNow == expected)
  }

  test("multi-writer mix with deletion-vector mutations stays serializable") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-stress-dv").resolve("t").toString
    GraftLake.create(Seq.empty[(Long, Long)].toDF("id", "v"), path, Some("id"))
    GraftLake.enableCdf(path)
    val nWriters = 4
    val opsPer = 5
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    def retryCme[T](f: => T): T = {
      var last: Throwable = null
      (0 until 50).foreach { _ =>
        try return f
        catch { case e: java.util.ConcurrentModificationException => last = e }
      }
      throw last
    }
    // Ops restricted to the DV-COMPOSING family: append + updateDv +
    // deleteDv + mergeDv all run with sidecars outstanding (no compact
    // between ops), so this exercises stacked DVs under write races —
    // each path's expectVersion fence must retry cleanly, never
    // corrupt.
    val results = Await.result(Future.sequence((0 until nWriters).map { w =>
      Future {
        val rnd = new scala.util.Random(7000 + w)
        val base = w * 100000L
        var next = 1L
        val state = scala.collection.mutable.Map[Long, Long]()
        def freshIds(n: Int): Seq[Long] = {
          val ids = (next until next + n).map(base + _); next += n; ids
        }
        (0 until opsPer).foreach { _ =>
          rnd.nextInt(4) match {
            case 1 if state.nonEmpty => // MoR update of some own rows
              val upd = rnd.shuffle(state.keys.toSeq).take(8)
              retryCme(GraftLake.updateDv(spark, path,
                col("id").isin(upd: _*), Seq("v" -> (col("v") + 7)),
                Some("id")))
              upd.foreach(k => state(k) = state(k) + 7)
            case 2 if state.nonEmpty => // MoR positional delete
              val del = rnd.shuffle(state.keys.toSeq).take(4)
              retryCme(GraftLake.deleteDv(spark, path,
                col("id").isin(del: _*)))
              del.foreach(state -= _)
            case 3 if state.nonEmpty => // MoR merge: replace + insert
              val upd = rnd.shuffle(state.keys.toSeq).take(6)
              val ins = freshIds(3)
              val rows = upd.map(k => (k, state(k) * 2 + 1)) ++
                ins.map(i => (i, i * 10))
              retryCme(GraftLake.mergeDv(spark, path,
                rows.toDF("id", "v"), Seq("id"), "id"))
              rows.foreach { case (k, v) => state(k) = v }
            case _ => // append a fresh slice
              val ids = freshIds(15 + rnd.nextInt(10))
              val rows = ids.map(i => (i, i * 10))
              retryCme(GraftLake.append(rows.toDF("id", "v"), path,
                Some("id")))
              rows.foreach { case (k, v) => state(k) = v }
          }
        }
        state.toMap
      }
    }), 10.minutes)
    val expected = results.reduce(_ ++ _)
    def tableNow: Map[Long, Long] = GraftLake.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tableNow == expected)
    val vs = GraftLake.commits(path).map(_.version)
    assert(vs == (0 to vs.last).toSeq, s"log gaps: $vs")
    // CDF replay (typed feed alone) reaches the same state through
    // the interleaved updatedv/tombstone/append image streams.
    val feed = GraftLake.changesTyped(spark, path, -1).localCheckpoint(true)
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "update_preimage", 0).otherwise(1).desc)
    val mirror = feed.withColumn("_rn", row_number().over(win))
      .filter(col("_rn") === 1).filter(col("_change_type") =!= "delete")
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mirror == expected)
    // Compact materializes every stacked sidecar; state is unchanged
    // and the tombstone list drains.
    GraftLake.compact(spark, path, Seq("id"), numFiles = 4, Some("id"))
    assert(GraftLake.snapshot(path).tombstones.isEmpty)
    assert(tableNow == expected)
    GraftLake.vacuum(path, retainMillis = 0L)
    assert(tableNow == expected)
  }
}
