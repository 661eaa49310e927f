package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.Tables
import graft.model.Event

/** Streaming FUNNEL (SURVEY.md §2: st11) — q62's ordered
  * view→click→purchase funnel as a PER-USER STATE MACHINE in the
  * streaming state store.
  *
  * The batch funnel needs the whole history per stage; the streaming
  * form carries three timestamps per user (first view, first click
  * after it, first purchase after that) and advances them greedily as
  * micro-batches arrive. The greedy fold equals the batch min-ts
  * chaining WHEN each user's events arrive in event-time order across
  * batches — which the drive guarantees by staging time-range batches
  * (exactly a replayed Kafka topic's per-key ordering). State is 24
  * bytes per user forever; per-batch output is one progression row
  * per ACTIVE user.
  */
object FunnelStream {

  /** -1 = stage not reached yet; all times in epoch micros. */
  case class FunnelSt(view: Long, click: Long, purchase: Long)
  case class FunnelProg(user_id: Long, stage: Int)

  private def micros(ts: java.sql.Timestamp): Long = {
    val inst = ts.toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** Advance one user's state with one batch of events (sorted by
    * event time here; ordering ACROSS batches is the caller's drive
    * contract). Strict `>` comparisons match the batch oracle's
    * `e.ts > prev.t` chaining exactly.
    */
  private[graft] def advance(st: FunnelSt, events: Seq[Event]): FunnelSt = {
    var (v, c, p) = (st.view, st.click, st.purchase)
    events.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val t = micros(e.ts)
      e.event_type match {
        case "view" if v < 0 => v = t
        case "click" if v >= 0 && c < 0 && t > v => c = t
        case "purchase" if c >= 0 && p < 0 && t > c => p = t
        case _ =>
      }
    }
    FunnelSt(v, c, p)
  }

  private def stageOf(st: FunnelSt): Int =
    if (st.purchase >= 0) 3 else if (st.click >= 0) 2 else if (st.view >= 0) 1 else 0

  /** The unified batch/stream transform: per-user funnel progression
    * after each micro-batch (one row per active user per batch; the
    * stage is monotone, so `max(stage)` per user downstream is the
    * final answer).
    */
  def funnelStates(events: Dataset[Event]): Dataset[FunnelProg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event],
         state: org.apache.spark.sql.streaming.GroupState[FunnelSt]) =>
          val st = advance(
            state.getOption.getOrElse(FunnelSt(-1L, -1L, -1L)), it.toSeq)
          state.update(st)
          FunnelProg(uid, stageOf(st))
      }
  }

  /** Buffered per-user state: the committed funnel fold plus the
    * not-yet-watermarked events, as (micros, event_id, event_type).
    */
  case class FunnelBuf(st: FunnelSt, buf: Seq[(Long, Long, String)])

  private def advanceRaw(st: FunnelSt, events: Seq[(Long, Long, String)]): FunnelSt = {
    var (v, c, p) = (st.view, st.click, st.purchase)
    events.sorted.foreach { case (t, _, typ) =>
      typ match {
        case "view" if v < 0 => v = t
        case "click" if v >= 0 && c < 0 && t > v => c = t
        case "purchase" if c >= 0 && p < 0 && t > c => p = t
        case _ =>
      }
    }
    FunnelSt(v, c, p)
  }

  /** WATERMARK-BUFFERED funnel — [[funnelStates]] without the
    * ordered-replay drive contract: events may arrive in ANY order
    * across micro-batches (up to the watermark's allowed lateness)
    * and the result still equals the batch funnel.
    *
    * Per user the state is (committed fold, buffer of unwatermarked
    * events). Each batch: buffer the arrivals, COMMIT (fold in full
    * event-time order) exactly the buffered events now at or below
    * the watermark — their order can no longer change — and emit the
    * stage of the committed fold extended SPECULATIVELY over the
    * still-buffered tail. Funnel stage is MONOTONE in the event set
    * (another view can only lower the view anchor, which only widens
    * click eligibility, etc.), so speculative stages never overshoot
    * the final answer and `max(stage)` downstream stays correct; once
    * every event has arrived, the speculative fold IS the one-shot
    * batch fold. State stays O(events inside the lateness window) per
    * user — the watermark, not history, bounds the buffer. Events
    * later than the allowed lateness fold conservatively on arrival
    * (same contract under which Spark's own event-time aggregates
    * drop them).
    */
  def funnelStatesBuffered(
      events: Dataset[Event], delayThreshold: String): Dataset[FunnelProg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event],
         state: org.apache.spark.sql.streaming.GroupState[FunnelBuf]) =>
          val prev = state.getOption.getOrElse(FunnelBuf(FunnelSt(-1L, -1L, -1L), Seq.empty))
          val arrived = it.map(e => (micros(e.ts), e.event_id, e.event_type)).toSeq
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (ripe, hold) = (prev.buf ++ arrived).partition(_._1 <= wmMicros)
          val committed = advanceRaw(prev.st, ripe)
          state.update(FunnelBuf(committed, hold))
          Iterator.single(
            FunnelProg(uid, stageOf(advanceRaw(committed, hold))))
      }
  }

  /** st11, gated: drive three EVENT-TIME-RANGE micro-batches (thirds
    * of the absolute [min ts, max ts] span — per-key order preserved
    * across batches, the replayed-topic contract, regardless of the
    * dataset's date span) through [[funnelStates]], append
    * each batch's progressions to parquet executor-side, then reduce
    * to the stage counts. Oracle = the BATCH funnel CTE (q62's): the
    * state machine must lose nothing across batch boundaries.
    */
  def st11StreamFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-st11")
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val inDir = base.resolve("in").toString
    val ckDir = base.resolve("ck").toString
    val outDir = base.resolve("out").toString
    // The per-user state store instantiates one partition per shuffle
    // partition and commits EVERY one each micro-batch; a quarter of
    // the session's shuffle setting holds the O(users) state while
    // cutting the per-batch commit fan-out 4x (st17's pattern) —
    // DERIVED from the session, never a literal, so a production
    // session's state parallelism scales with its cluster. Read at
    // query START, so the temporary setting scopes to this stream only.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(1, prevParts.toInt / 4).toString)
    val q =
      try {
        spark.readStream.schema(events.schema).parquet(inDir)
          .as[Event]
          .transform(funnelStates)
          .writeStream
          .option("checkpointLocation", ckDir)
          .outputMode("update")
          .foreachBatch { (batch: Dataset[FunnelProg], _: Long) =>
            batch.toDF().write.mode("append").parquet(outDir)
            ()
          }
          .start()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
    try {
      // ABSOLUTE event-time thresholds, not dayofmonth: batch k holds
      // ts in [c(k-1), c(k)), so a later batch can never carry an
      // earlier event — the replayed-topic per-key ordering contract
      // holds for any date span (a multi-month dataset breaks the
      // dayofmonth split: month 2 day 5 would land before month 1
      // day 15). The cutoffs are a bounded 2-value driver agg.
      val b = events.agg(min(col("ts")), max(col("ts"))).head
      val (lo, hi) = (b.getTimestamp(0).getTime, b.getTimestamp(1).getTime)
      val step = math.max((hi - lo) / 3, 1L)
      val c1 = new java.sql.Timestamp(lo + step)
      val c2 = new java.sql.Timestamp(lo + 2 * step)
      Staging.stageBatches(events,
        when(col("ts") < lit(c1), 0)
          .when(col("ts") < lit(c2), 1).otherwise(2), 3, inDir) { _ =>
        q.processAllAvailable()
      }
    } finally {
      q.stop()
    }
    val finalStage = spark.read.parquet(outDir)
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
      .localCheckpoint(true)
    // Stage counts in q62's presentation; cleanup after materializing.
    graft.SparkEntry.rmrf(base.toString)
    def cnt(k: Int, tag: String): DataFrame =
      finalStage.filter(col("stage") >= k)
        .agg(count(lit(1)).as("users")).select(lit(tag).as("stage"), col("users"))
    cnt(1, "stage1_view")
      .unionByName(cnt(2, "stage2_click"))
      .unionByName(cnt(3, "stage3_purchase"))
      .orderBy(col("stage"))
  }
}
