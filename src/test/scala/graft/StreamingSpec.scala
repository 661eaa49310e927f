package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Event
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String): Event =
    Event(id, Timestamp.valueOf(t), user, typ, 1.0, "{\"k\": 1}")

  test("windowedCounts: streaming result equals batch result on same data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      ev(1, "2024-01-01 00:10:00", 1, "click"),
      ev(2, "2024-01-01 00:50:00", 1, "click"),
      ev(3, "2024-01-01 01:10:00", 2, "view"),
      ev(4, "2024-01-01 01:20:00", 2, "click"))

    val stream = MemoryStream[Event]
    stream.addData(data)
    val q = EventStreams.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("wc_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.sql("SELECT * FROM wc_out ORDER BY window_start, event_type").collect()
    val batch = EventStreams.windowedCounts(data.toDF())
      .orderBy("window_start", "event_type").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.length == 3) // (00h click x2), (01h view), (01h click)
  }

  test("st05 streaming top-users: update-mode agg + foreachBatch rank equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      ev(1, "2024-01-01 00:05:00", 1, "click"),
      ev(2, "2024-01-01 00:10:00", 1, "click"),
      ev(3, "2024-01-01 00:15:00", 2, "click"),
      ev(4, "2024-01-01 00:20:00", 2, "click"),
      ev(5, "2024-01-01 00:25:00", 2, "view"),
      ev(6, "2024-01-01 00:30:00", 3, "view"),
      ev(7, "2024-01-01 00:35:00", 4, "view"),
      ev(8, "2024-01-01 01:05:00", 5, "click"))

    // The production streaming shape: windowed aggregate maintained by
    // the engine (watermark bounds state), rank applied over the FULL
    // maintained result table — never over one micro-batch's changed
    // rows, which would rank only whoever changed last.
    val sink = new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)
    val stream = MemoryStream[Event]
    stream.addData(data)
    val counts = EventStreams.hourlyUserCounts(
      stream.toDF().withWatermark("ts", "10 minutes"))
    val q = counts.writeStream
      .format("memory").queryName("st05_counts").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val ranked = EventStreams.rankTopUsers(spark.table("st05_counts"))
        .orderBy("window_start", "rnk")
      sink.set(ranked.collect().map(_.toString).toSeq)
    } finally q.stop()

    val batch = EventStreams.rankTopUsers(EventStreams.hourlyUserCounts(data.toDF()))
      .orderBy("window_start", "rnk").collect().map(_.toString).toSeq
    assert(sink.get == batch)
    // hour 0: user 2 (3 events) ranks first, then user 1 (2), then 3/4 tie->3
    assert(batch.length == 4) // 3 ranked in hour 0 + 1 in hour 1
  }

  test("stateful streaming runs on the RocksDB state store (production backend)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The default in-memory (HDFS-backed) provider keeps all state on
    // the executor heap; RocksDB spills to local disk and is the
    // 100 TB-state backend. Same query, same results, different store.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val data = Seq(
        ev(1, "2024-01-01 00:10:00", 1, "click"),
        ev(2, "2024-01-01 00:20:00", 1, "click"),
        ev(3, "2024-01-01 01:10:00", 2, "view"))
      val stream = MemoryStream[Event]
      stream.addData(data)
      val q = EventStreams.windowedCounts(stream.toDF())
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.sql("SELECT * FROM rocks_out ORDER BY window_start, event_type")
        .collect().map(_.toString).toSeq
      val batch = EventStreams.windowedCounts(data.toDF())
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      assert(got == batch)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("watermarked streaming dedup drops duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(1, "2024-01-01 00:00:30", 1, "click"), // duplicate id
      ev(2, "2024-01-01 00:01:00", 1, "view"),
      ev(2, "2024-01-01 00:01:10", 1, "view"), // duplicate id
      ev(3, "2024-01-01 00:02:00", 2, "click"))
    val stream = MemoryStream[Event]
    stream.addData(data)
    val deduped = EventStreams.dedupEvents(
      stream.toDF().withWatermark("ts", "10 minutes"), streaming = true)
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.sql("SELECT event_id FROM dedup_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("event-time timeout flushes an open session once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionize(
      stream.toDS().withWatermark("ts", "10 minutes"),
      emitOpenTail = false, eventTimeTimeout = true)
      .writeStream.format("memory").queryName("sess3_out").outputMode("append").start()
    try {
      // User 1's open session (ends 00:10; inactivity horizon 00:40).
      stream.addData(Seq(
        ev(1, "2024-01-01 00:00:00", 1, "click"),
        ev(2, "2024-01-01 00:10:00", 1, "click")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess3_out").count() == 0)

      // Another user's late activity drives the watermark to 01:50,
      // far past user 1's horizon -> timeout fires on the next trigger.
      stream.addData(Seq(ev(3, "2024-01-01 02:00:00", 2, "click")))
      q.processAllAvailable()
      stream.addData(Seq(ev(4, "2024-01-01 02:05:00", 2, "click")))
      q.processAllAvailable()

      val out = spark.sql("SELECT * FROM sess3_out WHERE user_id = 1").collect()
      assert(out.length == 1, s"expected flushed session, got ${out.toSeq}")
      assert(out.head.getAs[Int]("n_events") == 2)
      assert(out.head.getAs[Double]("duration_sec") == 600.0)
    } finally q.stop()
  }

  test("stream-stream interval join, streaming == batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errors = Seq(
      ev(10, "2024-01-01 01:00:00", 1, "error"),
      ev(11, "2024-01-01 05:00:00", 2, "error"))
    val purchases = Seq(
      ev(20, "2024-01-01 01:10:00", 1, "purchase"), // within 30m of 10
      ev(21, "2024-01-01 01:40:00", 1, "purchase"), // outside 30m
      ev(22, "2024-01-01 05:05:00", 2, "purchase"), // within 30m of 11
      ev(23, "2024-01-01 04:00:00", 2, "purchase")) // before the error

    val eStream = MemoryStream[Event]
    val pStream = MemoryStream[Event]
    eStream.addData(errors)
    pStream.addData(purchases)
    val joined = EventStreams.errorPurchaseJoin(
      eStream.toDF().withWatermark("ts", "1 hour"),
      pStream.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.sql("SELECT * FROM ss_join_out ORDER BY error_id, purchase_id")
      .collect().map(_.toString).toSeq
    val batch = EventStreams.errorPurchaseJoin(errors.toDF(), purchases.toDF())
      .orderBy("error_id", "purchase_id").collect().map(_.toString).toSeq
    assert(streamed == batch)
    assert(streamed == Seq("[10,20,1]", "[11,22,2]"))
  }

  test("st07 stream-stream LEFT OUTER join emits unmatched errors after watermark close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errors = Seq(
      ev(10, "2024-01-01 01:00:00", 1, "error"), // converted
      ev(11, "2024-01-01 05:00:00", 2, "error"), // NOT converted
      ev(12, "2024-01-01 05:10:00", 3, "error"), // NOT converted
      // Error-side watermark driver (global wm = MIN over both
      // streams): converts immediately, and pushes the error wm to
      // 08:00 — past 11's and 12's [ts, ts+30m] windows.
      ev(13, "2024-01-01 09:00:00", 4, "error"))
    val purchases = Seq(
      ev(20, "2024-01-01 01:10:00", 1, "purchase"), // within 30m of 10
      ev(21, "2024-01-01 06:00:00", 2, "purchase"), // outside 30m of 11
      ev(22, "2024-01-01 09:05:00", 4, "purchase"), // within 30m of 13
      // Purchase-side watermark driver: wm_p = 11:00.
      ev(99, "2024-01-01 12:00:00", 9, "purchase"))
    // Second driver: outer rows flush in the micro-batch AFTER the
    // watermark advances, and a new batch only runs when data arrives.
    val lateDriver = ev(98, "2024-01-01 12:30:00", 9, "purchase")

    val eStream = MemoryStream[Event]
    val pStream = MemoryStream[Event]
    eStream.addData(errors)
    pStream.addData(purchases)
    val joined = EventStreams.errorPurchaseLeftJoin(
      eStream.toDF().withWatermark("ts", "1 hour"),
      pStream.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("ss_left_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      pStream.addData(Seq(lateDriver))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql("SELECT * FROM ss_left_out ORDER BY error_id, purchase_id")
      .collect().map(_.toString).toSeq
    val batch = EventStreams.errorPurchaseLeftJoin(
      errors.toDF(), (purchases :+ lateDriver).toDF())
      .orderBy("error_id", "purchase_id").collect().map(_.toString).toSeq
    assert(streamed == batch, s"streaming $streamed != batch $batch")
    assert(streamed == Seq("[10,1,20,true]", "[11,2,null,false]",
      "[12,3,null,false]", "[13,4,22,true]"))
  }

  test("st06 session_window: streaming result equals batch, and merges gaps under 30 min") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:20:00", 1, "click"), // 20-min gap: merges
      ev(3, "2024-01-01 01:30:00", 1, "click"), // 70-min gap: new session
      ev(4, "2024-01-01 00:00:00", 2, "view"))

    val stream = MemoryStream[Event]
    stream.addData(data)
    val q = EventStreams.sessionWindowAgg(
      stream.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sw_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.sql("SELECT * FROM sw_out ORDER BY user_id, start_us")
      .collect().map(_.toString).toSeq
    val batch = EventStreams.sessionWindowAgg(data.toDF())
      .orderBy("user_id", "start_us").collect()
    assert(streamed == batch.map(_.toString).toSeq)

    val u1 = batch.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2)
    assert(u1.head.getAs[Int]("n_events") == 2)
    // end = last event + gap: 00:20 + 30 min = 00:50
    assert(u1.head.getAs[Long]("end_us") ==
      Timestamp.valueOf("2024-01-01 00:50:00").getTime * 1000L)
  }

  test("streaming aggregates report state-store metrics in progress") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(Seq(
      ev(1, "2024-01-01 00:10:00", 1, "click"),
      ev(2, "2024-01-01 00:20:00", 2, "view")))
    val q = EventStreams.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("metrics_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // The operator surface the driver of a 100 TB stream watches:
      // per-operator state rows/bytes must be reported and non-empty.
      val progress = q.lastProgress
      assert(progress != null, "expected at least one progress event")
      val ops = progress.stateOperators
      assert(ops.nonEmpty, "stateful agg must report a state operator")
      assert(ops.head.numRowsTotal > 0, "state rows should be tracked")
      assert(ops.head.memoryUsedBytes > 0, "state memory should be tracked")
    } finally q.stop()
  }

  test("streaming write to the V2 counting sink commits per-epoch exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.sources.CountingSink
    val stream = MemoryStream[Event]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val q = stream.toDF()
      .writeStream.format("graft-counting-sink")
      .option("tag", "stream-sink").option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        ev(1, "2024-01-01 00:00:00", 1, "click"),
        ev(2, "2024-01-01 00:01:00", 1, "click")))
      q.processAllAvailable()
      stream.addData(Seq(ev(3, "2024-01-01 00:02:00", 2, "view")))
      q.processAllAvailable()
    } finally q.stop()
    assert(CountingSink.committedRows("stream-sink").contains(3L))
    val epochs = CountingSink.committedEpochs("stream-sink")
    assert(epochs.length == 2 && epochs == epochs.distinct,
      s"expected two distinct committed epochs, got $epochs")
  }

  test("stateful sessionization splits on 30-min gaps (batch complete)") {
    import spark.implicits._
    val data = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "click"),
      ev(2, "2024-01-01 00:10:00", 1, "click"), // same session
      ev(3, "2024-01-01 01:00:00", 1, "click"), // 50-min gap -> new session
      ev(4, "2024-01-01 00:00:00", 2, "view")) // other user
    val batch = EventStreams.sessionize(data.toDS()).toDF()
      .orderBy("user_id", "session_idx").collect()
    val u1 = batch.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2)
    assert(u1.map(_.getAs[Int]("n_events")).toSeq == Seq(2, 1))
    assert(batch.count(_.getAs[Long]("user_id") == 2L) == 1)
  }

  test("stateful sessionization merges a session spanning micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionize(stream.toDS(), emitOpenTail = false)
      .writeStream.format("memory").queryName("sess2_out").outputMode("append").start()
    try {
      // Batch 1: two events 10 min apart — one OPEN session, not emitted.
      stream.addData(Seq(
        ev(1, "2024-01-01 00:00:00", 1, "click"),
        ev(2, "2024-01-01 00:10:00", 1, "click")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess2_out").count() == 0)

      // Batch 2: 00:15 continues the session (5-min gap), then a
      // 2-hour jump closes it -> exactly one MERGED 3-event session.
      stream.addData(Seq(
        ev(3, "2024-01-01 00:15:00", 1, "click"),
        ev(4, "2024-01-01 02:30:00", 1, "click")))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM sess2_out ORDER BY session_idx").collect()
      assert(out.length == 1)
      assert(out.head.getAs[Int]("session_idx") == 0)
      assert(out.head.getAs[Int]("n_events") == 3) // merged across batches
      assert(out.head.getAs[Double]("duration_sec") == 900.0)

      // Batch 3: another jump closes the 02:30 session with idx 1.
      stream.addData(Seq(ev(5, "2024-01-01 06:00:00", 1, "click")))
      q.processAllAvailable()
      val out2 = spark.sql("SELECT * FROM sess2_out ORDER BY session_idx").collect()
      assert(out2.length == 2)
      assert(out2(1).getAs[Int]("session_idx") == 1) // index carried in state
      assert(out2(1).getAs[Int]("n_events") == 1)
    } finally q.stop()
  }

  test("st09 sketch heavy hitters aggregate streams: complete mode equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, sf).as[Event].collect().toSeq
    val (b1, b2) = all.splitAt(all.length / 2)
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedHeavyHitters(stream.toDF())
      .writeStream.format("memory").queryName("st09_out")
      .outputMode("complete").start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2) // sketch state must accumulate across batches
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM st09_out ORDER BY window_start, rnk")
      .collect().map(_.toString).toSeq
    val batch = EventStreams.st09StreamHeavyHitters(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("st08 streaming curation dedups across batches and equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.DocStreams
    val docs = Tables.documents(spark, sf)
      .as[model.Document].collect().toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[model.Document]
    val q = DocStreams.dedupCurated(DocStreams.curate(stream.toDF()))
      .writeStream.format("memory").queryName("st08_out")
      .outputMode("append").start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      // Batch 2 replays some batch-1 docs: cross-batch dedup state must
      // swallow them.
      stream.addData(b2 ++ b1.take(10))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = DocStreams.langStats(spark.table("st08_out"))
      .orderBy("lang").collect().map(_.toString).toSeq
    val batch = DocStreams.st08StreamCurate(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("st11 buffered funnel: SHUFFLED batch assignment equals the batch answer") {
    import graft.streaming.FunnelStream
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.eventsDs(spark, sf).collect().toSeq
    val want = graft.operators.Analytics.q62Funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // Time-IGNORING batch assignment: a later batch routinely carries
    // earlier events — exactly what breaks the ordered-replay contract
    // of funnelStates. The lateness bound spans the data, so nothing
    // is dropped however scrambled the arrival.
    val rnd = new scala.util.Random(7)
    val assignment = evs.map(e => rnd.nextInt(3) -> e)
    val stream = MemoryStream[Event]
    val q = FunnelStream.funnelStatesBuffered(stream.toDS(), "365 days")
      .writeStream.format("memory").queryName("st11_buf")
      .outputMode("update").start()
    try {
      (0 until 3).foreach { i =>
        stream.addData(assignment.collect { case (b, e) if b == i => e })
        q.processAllAvailable()
      }
    } finally q.stop()
    val fin = spark.table("st11_buf")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val counts = Map(
      "stage1_view" -> fin.values.count(_ >= 1).toLong,
      "stage2_click" -> fin.values.count(_ >= 2).toLong,
      "stage3_purchase" -> fin.values.count(_ >= 3).toLong)
    assert(counts == want, "shuffled arrival must fold to the batch funnel")

    // Time-ranged drive with a tight lateness bound: the watermark
    // COMMITS early batches out of the buffer (state drains) and the
    // answer still matches.
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val stream2 = MemoryStream[Event]
    val q2 = FunnelStream.funnelStatesBuffered(stream2.toDS(), "2 days")
      .writeStream.format("memory").queryName("st11_buf2")
      .outputMode("update").start()
    try {
      sorted.grouped(math.max(1, sorted.size / 3 + 1)).foreach { b =>
        stream2.addData(b)
        q2.processAllAvailable()
      }
    } finally q2.stop()
    val fin2 = spark.table("st11_buf2")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fin2 == fin, "watermark-committed path must equal the buffered path")
  }

  test("st11 funnel state machine: any event-time batch split equals one-shot") {
    import graft.streaming.FunnelStream
    import graft.model.Event
    val evs = Tables.eventsDs(spark, sf).collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    def foldSplit(cuts: Seq[Int]): Map[Long, Int] = {
      // fold each user's events through `advance` in batch slices
      val slices = (Seq(0) ++ cuts ++ Seq(evs.size)).sliding(2)
        .map { case Seq(a, b) => evs.slice(a, b) }.toSeq
      val st = scala.collection.mutable.Map.empty[Long, FunnelStream.FunnelSt]
      slices.foreach { slice =>
        slice.groupBy(_.user_id).foreach { case (u, es) =>
          st(u) = FunnelStream.advance(
            st.getOrElse(u, FunnelStream.FunnelSt(-1L, -1L, -1L)), es)
        }
      }
      st.map { case (u, s) =>
        u -> (if (s.purchase >= 0) 3 else if (s.click >= 0) 2
              else if (s.view >= 0) 1 else 0)
      }.toMap
    }
    val oneShot = foldSplit(Seq.empty)
    assert(foldSplit(Seq(evs.size / 3, 2 * evs.size / 3)) == oneShot)
    assert(foldSplit(Seq(1, 2, 3, evs.size / 2)) == oneShot)
    // and the stage counts equal the batch funnel q62 computes
    val want = graft.operators.Analytics.q62Funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Map(
      "stage1_view" -> oneShot.values.count(_ >= 1).toLong,
      "stage2_click" -> oneShot.values.count(_ >= 2).toLong,
      "stage3_purchase" -> oneShot.values.count(_ >= 3).toLong)
    assert(counts == want)
  }
}
