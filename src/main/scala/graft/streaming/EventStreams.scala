package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables
import graft.model.Event

/** Structured Streaming operators (SURVEY.md §2: st01, st02).
  *
  * Both transforms are written against the unified Dataset API, so the
  * exact same code runs in batch (the driver's oracle gate) and under
  * `readStream` (exercised in the ScalaTest specs with MemoryStream).
  */
object EventStreams {

  /** Tumbling-window aggregation — works on batch or streaming input.
    * In streaming, pair with `.withWatermark("ts", ...)` upstream to
    * bound state.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(
        col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** st01 (oracle-checked in batch): hourly counts per event type. */
  def st01WindowedCounts(spark: SparkSession, dir: String): DataFrame =
    windowedCounts(Tables.events(spark, dir))
      .orderBy("window_start", "event_type")

  case class SessionSummary(
      user_id: Long, session_idx: Int, n_events: Int,
      start_us: Long, end_us: Long, duration_sec: Double)

  private val GapUs: Long = 30L * 60 * 1000000 // 30 min inactivity

  private def micros(ts: java.sql.Timestamp): Long = {
    val inst = ts.toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** Session split for one user's events (sorted here — at cluster
    * scale, feed pre-sorted via repartition+sortWithinPartitions).
    */
  def sessionsOf(userId: Long, events: Iterator[Event]): Iterator[SessionSummary] = {
    val sorted = events.toVector.sortBy(e => (micros(e.ts), e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Vector.newBuilder[SessionSummary]
      var idx = 0
      var start = micros(sorted.head.ts)
      var prev = start
      var n = 0
      def close(end: Long): Unit = {
        out += SessionSummary(userId, idx, n, start, end, (end - start) / 1e6)
        idx += 1; n = 0
      }
      sorted.foreach { e =>
        val t = micros(e.ts)
        if (n > 0 && t - prev > GapUs) { close(prev); start = t }
        n += 1; prev = t
      }
      close(prev)
      out.result().iterator
    }
  }

  /** Carried state: next session index + the open session's events. */
  case class SessState(nextIdx: Int, open: List[Event])

  /** Stateful sessionization via flatMapGroupsWithState.
    *
    * Streaming (`emitOpenTail = false`): each invocation merges the
    * carried open-session events with the batch's events, emits every
    * session CLOSED by a 30-min gap, and persists the open tail plus
    * the running session index via `state.update` — a session spanning
    * micro-batches is emitted once, merged, when a later event closes
    * it. The final open session stays pending (an infinite stream
    * never ends; pair with a timeout to flush on inactivity).
    *
    * Batch (`emitOpenTail = true`, the default): every session
    * including the open tail is emitted — the dataset is complete.
    */
  def sessionize(
      events: Dataset[Event],
      emitOpenTail: Boolean = true,
      eventTimeTimeout: Boolean = false): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            // Watermark passed the open session's inactivity horizon:
            // no on-time event can extend it — flush it.
            val carried = state.get
            state.remove()
            sessionsOf(userId, carried.open.iterator)
              .map(s => s.copy(session_idx = s.session_idx + carried.nextIdx))
          } else {
            val carried = state.getOption.getOrElse(SessState(0, Nil))
            val merged = carried.open ++ it
            val sessions = sessionsOf(userId, merged.iterator)
              .map(s => s.copy(session_idx = s.session_idx + carried.nextIdx))
              .toVector
            if (emitOpenTail || sessions.isEmpty) {
              if (state.exists) state.remove()
              sessions.iterator
            } else {
              val open = sessions.last
              state.update(SessState(
                open.session_idx,
                merged.filter(e => micros(e.ts) >= open.start_us)))
              if (eventTimeTimeout)
                state.setTimeoutTimestamp(open.end_us / 1000L + GapUs / 1000L)
              sessions.init.iterator
            }
          }
        })
  }

  /** Exactly-once event dedup — unified batch/stream form. Streaming
    * callers add `.withWatermark("ts", ...)` upstream and Spark keeps
    * only watermark-bounded dedup state
    * (`dropDuplicatesWithinWatermark`); in batch it's a plain
    * distinct-on-key.
    */
  def dedupEvents(events: DataFrame, streaming: Boolean): DataFrame =
    if (streaming) events.dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** st03 (oracle-checked in batch): per-type counts after dedup. */
  def st03DedupCounts(spark: SparkSession, dir: String): DataFrame =
    dedupEvents(Tables.events(spark, dir), streaming = false)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy("event_type")

  /** Stream-stream interval join: purchases within 30 min AFTER an
    * error by the same user. Works identically on batch frames; in
    * streaming both sides carry watermarks and the time-interval
    * predicate bounds the join state Spark must retain.
    */
  def errorPurchaseJoin(errors: DataFrame, purchases: DataFrame): DataFrame =
    errors.alias("e")
      .join(purchases.alias("p"),
        col("e.user_id") === col("p.user_id") &&
          col("p.ts") >= col("e.ts") &&
          col("p.ts") <= col("e.ts") + expr("INTERVAL 30 MINUTES"))
      .select(
        col("e.event_id").as("error_id"),
        col("p.event_id").as("purchase_id"),
        col("e.user_id").as("user_id"))

  /** st04 (oracle-checked in batch): error→purchase conversions. */
  def st04StreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    errorPurchaseJoin(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("error_id", "purchase_id")
  }

  /** Stream-stream LEFT OUTER interval join — st04's attribution join
    * but keeping UNCONVERTED errors too (purchase NULL). The semantics
    * Spark only permits in streaming when both sides carry watermarks
    * and the join has a time bound: a left row is held in state until
    * the watermark passes its match window's upper bound, THEN emitted
    * with nulls if nothing arrived — so "no match" is a statement
    * about a CLOSED window, never about data that merely hasn't
    * arrived yet. State per key is bounded by the 30-min window plus
    * the watermark delay.
    */
  def errorPurchaseLeftJoin(errors: DataFrame, purchases: DataFrame): DataFrame =
    errors.alias("e")
      .join(purchases.alias("p"),
        col("e.user_id") === col("p.user_id") &&
          col("p.ts") >= col("e.ts") &&
          col("p.ts") <= col("e.ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(
        col("e.event_id").as("error_id"),
        col("e.user_id").as("user_id"),
        col("p.event_id").as("purchase_id"),
        col("p.event_id").isNotNull.as("converted"))

  /** st07 (oracle-checked in batch): conversion attribution INCLUDING
    * the unconverted errors — the left-outer streaming join.
    */
  def st07StreamLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    errorPurchaseLeftJoin(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("error_id", "purchase_id")
  }

  /** st02 (rows-only): batch run of the stateful sessionizer. */
  def st02StatefulSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionize(Tables.eventsDs(spark, dir))
      .toDF()
      .orderBy("user_id", "session_idx")
  }

  /** Hourly per-user activity counts — the streaming aggregate
    * (watermark added by streaming callers). The rank step runs over
    * the MAINTAINED result table, never over a single micro-batch's
    * delta: update-mode output alone carries only changed rows, and
    * ranking those would crown whichever user happened to change last.
    * Windows are high-cardinality, so the rank's partitioning shards
    * by hour — no global sort.
    */
  def hourlyUserCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n"))

  def rankTopUsers(counts: DataFrame, k: Int = 3): DataFrame = {
    val byHour = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("user_id"))
    counts
      .withColumn("rnk", row_number().over(byHour).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("window_start"), col("rnk"), col("user_id"), col("n"))
  }

  /** st05 (oracle-checked in batch): top-3 most active users per hour.
    * The streaming twin maintains hourlyUserCounts as a streaming
    * aggregate and ranks the maintained table downstream (exercised in
    * StreamingSpec against this batch result).
    */
  def st05TopUsers(spark: SparkSession, dir: String): DataFrame =
    rankTopUsers(hourlyUserCounts(Tables.events(spark, dir)))
      .orderBy("window_start", "rnk")

  /** Native session-window aggregation — Spark's `session_window`
    * merges events whose gaps are strictly under 30 min into one
    * growing window (end = last event + gap). Unified batch/stream
    * form: streaming callers watermark `ts` upstream and Spark merges
    * session state incrementally per key.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events").cast("int").as("n_events"),
        col("sum_value"))

  /** st06 (oracle-checked in batch): per-user session windows. The
    * oracle replays the merge rule with a lag-gap sessionizer (new
    * session when gap >= 30 min — session_window's half-open [start,
    * last + gap) interval); the streaming twin is driven in
    * StreamingSpec and must equal this batch result.
    */
  def st06SessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(Tables.events(spark, dir))
      .orderBy("user_id", "start_us")

  /** Hourly top-3 users via the SpaceSaving sketch aggregate — the
    * unified transform behind st09. The custom TypedImperativeAggregate
    * runs inside a STREAMING aggregation exactly like a built-in: its
    * serialized buffer is the state-store value per window, updated
    * per micro-batch (spec-driven in update mode). Capacity is far
    * above the per-window user cardinality at gate SFs, so batch
    * results sit in the exact regime the oracle replays.
    */
  def windowedHeavyHitters(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.VectorFunctions.heavyHitters(
        col("user_id").cast("string"), 3, 4096).as("hh"))
      .select(col("w.start").as("window_start"), posexplode(col("hh")))
      .select(
        col("window_start"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.item").as("user_id"),
        col("col.cnt").as("cnt"))

  /** st09 (oracle-checked in batch; streaming == batch in the spec). */
  def st09StreamHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    windowedHeavyHitters(Tables.events(spark, dir))
      .orderBy("window_start", "rnk")
}
