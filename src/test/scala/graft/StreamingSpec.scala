package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Structured Streaming semantics (no DuckDB oracle possible —
  * SURVEY.md §5 risk 2): windows, watermark late-data drop, and
  * stateful sessionization, all driven through MemoryStream with
  * hand-computed expectations.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  private def runAll(q: StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("tumbling window stream counts match batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_t")
      .outputMode("update").start()
    try {
      input.addData(
        Event(ts(5), 1L, "view", 1.0),
        Event(ts(10), 1L, "view", 2.0),
        Event(ts(65), 2L, "click", 3.0))
      runAll(q)
      val rows = spark.table("tumbling_t")
        .select($"ws", $"event_type", $"n").as[(Timestamp, String, Long)]
        .collect().toSet
      assert(rows.contains((ts(0), "view", 2L)))
      assert(rows.contains((ts(60), "click", 1L)))
    } finally q.stop()
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.tumblingCounts(input.toDF(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("late_t")
      .outputMode("update").start()
    try {
      input.addData(Event(ts(5), 1L, "view", 1.0))
      runAll(q)
      // advance watermark far past the first window (+10m lateness)
      input.addData(Event(ts(600), 1L, "view", 1.0))
      runAll(q)
      // this event is now older than watermark → must be dropped
      input.addData(Event(ts(6), 1L, "view", 100.0))
      runAll(q)
      val n = spark.table("late_t")
        .filter($"ws" === ts(0)).select($"n").as[Long].collect().max
      assert(n == 1L, "late event leaked past the watermark")
    } finally q.stop()
  }

  test("session window stream groups by inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.sessionCounts(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("session_t")
      .outputMode("complete").start()
    try {
      // two sessions for user 1 (gap 40m > 30m), one for user 2
      input.addData(
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(10), 1L, "view", 1.0),
        Event(ts(50), 1L, "view", 1.0),
        Event(ts(0), 2L, "view", 1.0))
      runAll(q)
      val rows = spark.table("session_t")
        .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
      assert(rows.count(_._1 == 1L) == 2)
      assert(rows.filter(_._1 == 1L).map(_._2).sorted == Seq(1L, 2L))
      assert(rows.count(_._1 == 2L) == 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionize emits closed sessions with totals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val gapMs = 30L * 60000L
    val q = StreamingOps.sessionize(spark, input.toDS(), gapMs)
      .writeStream.format("memory").queryName("fmgws_t")
      .outputMode("append").start()
    try {
      input.addData(
        Event(ts(0), 1L, "view", 1.5),
        Event(ts(10), 1L, "click", 2.5))
      runAll(q)
      // in-batch gap close: a later event for the same user both closes
      // the first session inline and opens a new one
      input.addData(Event(ts(120), 1L, "view", 9.0))
      runAll(q)
      // advance the watermark far ahead so the open session times out
      input.addData(Event(ts(2000), 99L, "view", 0.0))
      runAll(q)
      input.addData(Event(ts(2100), 99L, "view", 0.0))
      runAll(q)
      val rows = spark.table("fmgws_t")
        .select($"user_id", $"n_events", $"total")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((1L, 2L, 4.0)), s"first session missing: $rows")
      assert(rows.contains((1L, 1L, 9.0)), s"timed-out session missing: $rows")
    } finally q.stop()
  }

  test("transformWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the new state API requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamingOps.runningTotals(spark, input.toDS())
        .toDF("user_id", "n", "total")
        .writeStream.format("memory").queryName("tws_t")
        .outputMode("update").start()
      try {
        input.addData(Event(ts(0), 1L, "view", 1.0), Event(ts(1), 1L, "view", 2.0))
        runAll(q)
        input.addData(Event(ts(2), 1L, "click", 3.5))
        runAll(q)
        val rows = spark.table("tws_t")
          .select($"user_id", $"n", $"total").as[(Long, Long, Double)]
          .collect().toSet
        assert(rows.contains((1L, 2L, 3.0)), s"first batch state missing: $rows")
        assert(rows.contains((1L, 3L, 6.5)), s"state not carried across batches: $rows")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stateful debounce drops within-window events across batches (q226's streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamingOps.debouncedEvents(spark, input.toDS())
        .writeStream.format("memory").queryName("tws_debounce")
        .outputMode("append").start()
      try {
        // batch 1: u1/view at 0, +5min (dropped: <=10min), +16min
        // (kept: predecessor is the +5 event — DEBOUNCE semantics,
        // 11min gap), plus a different type and a different user
        // inside the window (both kept — key isolation)
        input.addData(
          Event(ts(0), 1L, "view", 1.0), Event(ts(5), 1L, "view", 2.0),
          Event(ts(16), 1L, "view", 3.0),
          Event(ts(4), 1L, "click", 4.0), Event(ts(3), 2L, "view", 5.0))
        runAll(q)
        // batch 2: u1/view at +24min — within 10min of the LAST batch-1
        // event (+16) → dropped only if state crossed the batch
        // boundary; then +40min kept
        input.addData(Event(ts(24), 1L, "view", 6.0),
          Event(ts(40), 1L, "view", 7.0))
        runAll(q)
        val kept = spark.table("tws_debounce").as[Event].collect()
          .map(e => (e.user_id, e.event_type, e.value)).toSet
        assert(kept == Set((1L, "view", 1.0), (1L, "view", 3.0),
          (1L, "click", 4.0), (2L, "view", 5.0), (1L, "view", 7.0)),
          s"unexpected survivors: $kept")
      } finally q.stop()

      // batch-twin equivalence on replayed data: the streaming
      // survivors equal the q226 debounce rule applied in one pass
      val evs = (0 until 40).map(i =>
        Event(ts(i * 7L), (i % 3).toLong, if (i % 2 == 0) "view" else "click",
          i.toDouble))
      val input2 = MemoryStream[Event]
      val q2 = StreamingOps.debouncedEvents(spark, input2.toDS())
        .writeStream.format("memory").queryName("tws_debounce2")
        .outputMode("append").start()
      try {
        val (a, b) = evs.splitAt(17)
        input2.addData(a: _*); runAll(q2)
        input2.addData(b: _*); runAll(q2)
        val streamKept = spark.table("tws_debounce2").as[Event].collect()
          .map(e => (e.user_id, e.event_type, e.ts.getTime)).toSet
        val batchKept = evs.groupBy(e => (e.user_id, e.event_type)).values
          .flatMap { grp =>
            val s = grp.sortBy(_.ts.getTime)
            s.zipWithIndex.filter { case (e, i) =>
              i == 0 || e.ts.getTime - s(i - 1).ts.getTime > 600000L
            }.map(_._1)
          }.map(e => (e.user_id, e.event_type, e.ts.getTime)).toSet
        assert(streamKept == batchKept,
          s"stream/batch debounce diverged: ${streamKept.diff(batchKept)} / ${batchKept.diff(streamKept)}")
      } finally q2.stop()

      // TTL'd variant (the unbounded-key-space configuration): with a
      // TTL far above the test's wall time the survivors must equal
      // the exact run — TTL switches the time mode to ProcessingTime
      // and bounds state without changing in-window decisions.
      // NOTE: a processing-time-TTL stream schedules periodic state-
      // maintenance batches, so `processAllAvailable` never observes
      // a caught-up stream (it livelocked this suite for 40+ min) —
      // poll the sink for the expected survivors with a deadline
      // instead, the correct harness for timer-driven streams.
      val input3 = MemoryStream[Event]
      val q3 = StreamingOps.debouncedEvents(spark, input3.toDS(),
          stateTtlMs = 3600000L)
        .writeStream.format("memory").queryName("tws_debounce3")
        .outputMode("append").start()
      try {
        def pollUntil(want: Set[Double], what: String): Set[Double] = {
          val deadline = System.nanoTime() + 60_000_000_000L
          var got = Set.empty[Double]
          while (got != want && System.nanoTime() < deadline) {
            Thread.sleep(200)
            got = spark.table("tws_debounce3").as[Event].collect()
              .map(_.value).toSet
          }
          assert(got == want, s"$what: got $got, want $want")
          got
        }
        input3.addData(
          Event(ts(0), 1L, "view", 1.0), Event(ts(5), 1L, "view", 2.0))
        // +5 within 10min of 0 → dropped
        pollUntil(Set(1.0), "TTL'd debounce batch 1")
        input3.addData(Event(ts(8), 1L, "view", 3.0),
          Event(ts(30), 1L, "view", 4.0))
        // +8 within 10min of +5 (state crossed the batch boundary
        // under TTL mode) → dropped; +30 kept
        pollUntil(Set(1.0, 4.0), "TTL'd debounce batch 2")
      } finally q3.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stateful ordered funnel equals the q97 batch rule across batches (stream twin)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // users: 1 converts fully in order; 2 purchases BEFORE viewing
      // (must stall at step 1 until an in-order purchase arrives —
      // never); 3 clicks at exactly t1 (strict >, not a conversion)
      // then clicks later (converts); 4 only views
      val evs = Seq(
        Event(ts(0), 1L, "view", 0), Event(ts(1), 1L, "click", 0),
        Event(ts(2), 1L, "purchase", 0),
        Event(ts(0), 2L, "purchase", 0), Event(ts(1), 2L, "view", 0),
        Event(ts(2), 2L, "click", 0),
        Event(ts(3), 3L, "view", 0), Event(ts(3), 3L, "click", 0),
        Event(ts(5), 3L, "click", 0), Event(ts(9), 3L, "purchase", 0),
        Event(ts(7), 4L, "view", 0))
      val input = MemoryStream[Event]
      val q = StreamingOps.funnelEvents(spark, input.toDS())
        .toDF("user_id", "step", "step_ts")
        .writeStream.format("memory").queryName("tws_funnel")
        .outputMode("append").start()
      try {
        // split MID-USER so state must carry across the batch boundary
        val (a, b) = evs.splitAt(6)
        input.addData(a: _*); runAll(q)
        input.addData(b: _*); runAll(q)
        val got = spark.table("tws_funnel").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2).getTime))
          .toSet
        // driver recompute of the q97 batch rule (min strictly-after)
        val steps = Seq("view", "click", "purchase")
        val want = evs.groupBy(_.user_id).flatMap { case (u, g) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
          var last = Long.MinValue
          var i = 0
          var alive = true
          while (alive && i < steps.length) {
            val c = g.filter(e => e.event_type == steps(i) &&
              (i == 0 || e.ts.getTime > last)).map(_.ts.getTime)
            if (c.isEmpty) alive = false
            else { last = c.min; out += ((u, i + 1, last)); i += 1 }
          }
          out
        }.toSet
        assert(got == want,
          s"stream/batch funnel diverged: ${got.diff(want)} / ${want.diff(got)}")
        // the planted semantics explicitly: user 1 full; user 2's
        // pre-view purchase never converts (view→click only); user 3
        // converts via the LATER click; user 4 stops at step 1
        assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 2 &&
          got.count(_._1 == 3L) == 3 && got.count(_._1 == 4L) == 1)
        assert(got.contains((3L, 2, ts(5).getTime)),
          "user 3's click at t1 must NOT convert (strict >); the +5 click must")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming Misra-Gries heavy hitters: bounded state, error bound, cross-batch accumulation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val cap = 8
      val q = StreamingOps.heavyHitters(spark, input.toDS(), cap)
        .toDF("event_type", "user_id", "approx")
        .writeStream.format("memory").queryName("hh_t")
        .outputMode("update").start()
      try {
        // heavy user 1: 15 + 15 events; singletons 2..11 then 12..21
        // (20 distinct users through a capacity-8 sketch). N = 50, so
        // the MG bound is N/(cap+1) = 5: user 1 must survive with
        // 25 <= approx <= 30 — and > 15 PROVES the MapState carried
        // across batches (either batch alone caps at 15).
        input.addData(
          (1 to 15).map(i => Event(ts(i), 1L, "click", 1.0)) ++
            (2L to 11L).map(u => Event(ts(20 + u.toInt), u, "click", 1.0)): _*)
        runAll(q)
        input.addData(
          (1 to 15).map(i => Event(ts(40 + i), 1L, "click", 1.0)) ++
            (12L to 21L).map(u => Event(ts(60 + u.toInt), u, "click", 1.0)): _*)
        runAll(q)
        val rows = spark.table("hh_t")
          .select($"event_type", $"user_id", $"approx")
          .as[(String, Long, Long)].collect()
        val u1Max = rows.collect { case ("click", 1L, c) => c }.max
        assert(u1Max >= 25 && u1Max <= 30,
          s"MG bound violated for the heavy user: $u1Max")
        assert(u1Max > 15, s"state not carried across batches: $u1Max")
        // never an overcount for ANY emitted user (true counts: 15/30
        // for user 1 at the two emission points, 1 for singletons)
        rows.foreach { case (_, u, c) =>
          if (u != 1L) assert(c <= 1L, s"overcount for singleton $u: $c")
        }
        // bounded state: each batch emits the full counter map, which
        // must never exceed the capacity
        val perBatchCap = rows.length <= 2 * cap
        assert(perBatchCap, s"counter map exceeded capacity: ${rows.length} rows")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("event-time timers close sessions on the transformWithState API") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val gapMs = 30L * 60000L
      val q = StreamingOps.timerSessions(spark, input.toDS(), gapMs)
        .writeStream.format("memory").queryName("tws_sess")
        .outputMode("append").start()
      try {
        input.addData(
          Event(ts(0), 1L, "view", 1.5),
          Event(ts(10), 1L, "click", 2.5))
        runAll(q)
        // extends the session AFTER a timer was armed at ts(10)+30min:
        // the stale timer must NOT close it early
        input.addData(Event(ts(120), 1L, "view", 9.0))
        runAll(q)
        // advance the watermark far past the session deadline; the
        // second batch lets the expired timer fire with the advanced
        // watermark visible
        input.addData(Event(ts(2000), 99L, "view", 0.0))
        runAll(q)
        input.addData(Event(ts(2100), 99L, "view", 0.0))
        runAll(q)
        val rows = spark.table("tws_sess")
          .select($"user_id", $"n_events", $"total", $"session_end")
          .as[(Long, Long, Double, java.sql.Timestamp)].collect()
        assert(rows.map(r => (r._1, r._2, r._3)).toSet == Set((1L, 3L, 13.0)),
          s"expected exactly user 1's timer-closed session: ${rows.toSeq}")
        assert(rows.head._4 == ts(150),
          s"session_end must be lastTs + gap: ${rows.head._4}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("durable file sink + checkpoint: exactly-once across stop/restart") {
    import spark.implicits._
    // R15's durable-sink contract under Spark semantics: a parquet
    // sink with a checkpoint must survive kill/restart without
    // duplicating or dropping rows (file-source offsets + sink
    // _spark_metadata commit log together give exactly-once)
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt")
      .toFile.getAbsolutePath
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    val ckptDir = s"$root/ckpt"
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    def feed(events: Event*): Unit =
      events.toDF().write.mode("append").json(srcDir)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(srcDir)
        .withColumn("doubled", $"value" * 2)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    feed(Event(ts(0), 1L, "view", 1.0), Event(ts(1), 1L, "view", 2.0),
      Event(ts(2), 2L, "click", 3.0))
    runOnce()
    feed(Event(ts(3), 2L, "view", 4.0), Event(ts(4), 3L, "view", 5.0),
      Event(ts(5), 3L, "click", 6.0))
    runOnce() // restart from checkpoint: only the new files process
    runOnce() // restart with no new data: nothing re-emits
    val vals = spark.read.parquet(outDir)
      .select($"value").as[Double].collect().toSeq.sorted
    assert(vals == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0),
      s"exactly-once violated across restart: $vals")
  }

  test("transformWithState state survives kill + restart from checkpoint (exactly-once recovery)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // THE production contract of the stateful API: the RocksDB state
    // snapshot in the checkpoint, not the running JVM, owns the state.
    // Memory sinks refuse checkpoint recovery outside Complete mode,
    // so the sink is foreachBatch into a static buffer — the shape a
    // real pipeline uses anyway.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt")
        .toFile.getAbsolutePath
      val input = MemoryStream[Event]
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
      def start() = StreamingOps.runningTotals(spark, input.toDS())
        .toDF("user_id", "n", "total")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val rows = df.select($"user_id", $"n", $"total")
            .as[(Long, Long, Double)].collect()
          out.synchronized {
            rows.foreach { case (u, n, t) => out += ((batchId, u, n, t)) }
          }
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      try {
        input.addData(Event(ts(0), 1L, "view", 1.0), Event(ts(1), 1L, "view", 2.0))
        runAll(q1)
      } finally q1.stop() // simulated kill after the first commit
      val afterKill = out.synchronized(out.toSet)
      assert(afterKill.map { case (_, u, n, t) => (u, n, t) } == Set((1L, 2L, 3.0)),
        s"pre-kill state wrong: $afterKill")
      // data arrives while the query is DOWN
      input.addData(Event(ts(2), 1L, "click", 3.5))
      val q2 = start() // restart from the SAME checkpoint
      try runAll(q2) finally q2.stop()
      val emitted = out.synchronized(out.toList)
      // state resumed: the outage batch continues from (2, 3.0), so the
      // count is 3 — a state loss would restart it at 1
      assert(emitted.map { case (_, u, n, t) => (u, n, t) }.contains((1L, 3L, 6.5)),
        s"state lost across restart: $emitted")
      // exactly-once: the restarted query must not re-emit the already
      // committed first batch
      assert(emitted.count { case (_, u, _, _) => u == 1L } == 2,
        s"committed batch re-emitted after recovery: $emitted")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("GK quantile monitor state survives kill + restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_gk_ckpt")
        .toFile.getAbsolutePath
      val input = MemoryStream[Event]
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
      def start() = StreamingOps.quantileMonitor(spark, input.toDS(), eps = 0.05)
        .toDF("event_type", "n", "p50", "p95", "state_size")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select($"n", $"p50").as[(Long, Double)].collect()
          out.synchronized(rows.foreach(out += _))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      try {
        input.addData((1 to 200).map(i => Event(ts(i), i.toLong, "click", i.toDouble)): _*)
        runAll(q1)
      } finally q1.stop()
      // second half arrives while the query is DOWN; the restarted
      // query must resume the SKETCH, not restart it — its prefix
      // count reads 400 and its median moves to ~200 (a state loss
      // would report n=200 with median ~300)
      input.addData((201 to 400).map(i => Event(ts(i), i.toLong, "click", i.toDouble)): _*)
      val q2 = start()
      try runAll(q2) finally q2.stop()
      val emitted = out.synchronized(out.toList)
      assert(emitted.map(_._1).sorted == List(200L, 400L),
        s"prefix counts wrong across restart: $emitted")
      val p50After = emitted.find(_._1 == 400L).get._2
      assert(math.abs(p50After - 200.0) <= 0.05 * 400,
        s"sketch state lost across restart: p50 $p50After should be ~200")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("state-schema EVOLUTION: upgraded processor with an added state field restarts from a V1 checkpoint (avro encoding)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // The production restart that the kill/restart specs do NOT cover:
    // the operator comes back UPGRADED — same state variable name, one
    // field appended to its schema. With the default UnsafeRow state
    // encoding this is a pinned incompatibility; with avro encoding
    // (set BEFORE the first run — the format is fixed at checkpoint
    // creation) Avro schema evolution reads V1 rows into the V2 schema
    // with the added field defaulted, so the upgrade keeps the state.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_evo_ckpt")
        .toFile.getAbsolutePath
      val input = MemoryStream[Event]
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double)]()

      // V2: same "totals" state variable, schema (n, total) -> (n,
      // total, maxv); emits the migrated max so the spec can see what
      // V1 state became. Spec-local on purpose — the upgrade artifact.
      class RunningTotalsProcessorV2
          extends org.apache.spark.sql.streaming.StatefulProcessor[
            Long, Event, (Long, Long, Double, Double)] {
        @transient private var totals
            : org.apache.spark.sql.streaming.ValueState[(Long, Double, Double)] = _
        override def init(
            outputMode: org.apache.spark.sql.streaming.OutputMode,
            timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
          totals = getHandle.getValueState[(Long, Double, Double)](
            "totals",
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaDouble,
              org.apache.spark.sql.Encoders.scalaDouble),
            org.apache.spark.sql.streaming.TTLConfig.NONE)
        }
        override def handleInputRows(
            key: Long, rows: Iterator[Event],
            timerValues: org.apache.spark.sql.streaming.TimerValues)
            : Iterator[(Long, Long, Double, Double)] = {
          val (pn, pv, pm) =
            if (totals.exists()) totals.get() else (0L, 0.0, 0.0)
          var (n, total, maxv) = (pn, pv, pm)
          rows.foreach { e =>
            n += 1; total += e.value; maxv = math.max(maxv, e.value)
          }
          totals.update((n, total, maxv))
          Iterator((key, n, total, maxv))
        }
      }

      def startV1() = StreamingOps.runningTotals(spark, input.toDS())
        .toDF("user_id", "n", "total")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select($"user_id", $"n", $"total")
            .as[(Long, Long, Double)].collect()
          out.synchronized(rows.foreach { case (u, n, t) =>
            out += ((u, n, t, Double.NaN))
          })
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      def startV2() = input.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new RunningTotalsProcessorV2,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("user_id", "n", "total", "maxv")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select($"user_id", $"n", $"total", $"maxv")
            .as[(Long, Long, Double, Double)].collect()
          out.synchronized(rows.foreach(out += _))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = startV1()
      try {
        input.addData(Event(ts(0), 1L, "view", 1.0), Event(ts(1), 1L, "view", 2.0))
        runAll(q1)
      } finally q1.stop() // kill; the upgrade deploys while we're down
      assert(out.synchronized(out.toSet)
        .map { case (u, n, t, _) => (u, n, t) } == Set((1L, 2L, 3.0)))

      input.addData(Event(ts(2), 1L, "click", 3.5))
      val q2 = startV2() // V2 processor, SAME checkpoint
      try runAll(q2) finally q2.stop()
      val emitted = out.synchronized(out.toList)
      // state kept: count continues 2 -> 3, total 3.0 -> 6.5; the NEW
      // field starts from its default (0.0), so max reflects only the
      // post-upgrade event — exactly Avro's added-field semantics
      assert(emitted.map { case (u, n, t, _) => (u, n, t) }
        .contains((1L, 3L, 6.5)),
        s"V1 state lost across the schema upgrade: $emitted")
      val v2row = emitted.find { case (_, n, _, _) => n == 3L }.get
      assert(v2row._4 == 3.5,
        s"added field should default then absorb new data: $v2row")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state-schema evolution under the DEFAULT UnsafeRow encoding is a pinned failure (migration requires avro)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // The contrast case, pinned so an operator upgrade on a default-
    // encoded checkpoint fails LOUDLY in CI rather than silently in
    // production: UnsafeRow state bytes carry no schema, so Spark
    // refuses the widened schema at restart instead of misreading them.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_evo_ur_ckpt")
        .toFile.getAbsolutePath
      val input = MemoryStream[Event]
      val q1 = StreamingOps.runningTotals(spark, input.toDS())
        .writeStream
        // the sink must run an ACTION or the state stores never
        // load/commit and Spark 4's commit validation trips instead
        .foreachBatch { (df: org.apache.spark.sql.Dataset[(Long, Long, Double)], _: Long) =>
          df.collect(); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        input.addData(Event(ts(0), 1L, "view", 1.0))
        runAll(q1)
      } finally q1.stop()

      class WidenedProcessor
          extends org.apache.spark.sql.streaming.StatefulProcessor[
            Long, Event, (Long, Long)] {
        @transient private var totals
            : org.apache.spark.sql.streaming.ValueState[(Long, Double, Double)] = _
        override def init(
            outputMode: org.apache.spark.sql.streaming.OutputMode,
            timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
          totals = getHandle.getValueState[(Long, Double, Double)](
            "totals",
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaDouble,
              org.apache.spark.sql.Encoders.scalaDouble),
            org.apache.spark.sql.streaming.TTLConfig.NONE)
        }
        override def handleInputRows(
            key: Long, rows: Iterator[Event],
            timerValues: org.apache.spark.sql.streaming.TimerValues)
            : Iterator[(Long, Long)] = Iterator((key, rows.size.toLong))
      }
      val q2 = input.toDS().groupByKey(_.user_id)
        .transformWithState(new WidenedProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) =>
          df.collect(); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      input.addData(Event(ts(2), 1L, "click", 3.5))
      val err = intercept[Exception] {
        q2.processAllAvailable()
      }
      q2.stop()
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      val msgs = chain(err).map(e =>
        s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")
      assert(msgs.exists(m => m.toLowerCase.contains("schema")),
        s"expected a state-schema incompatibility, got: ${msgs.mkString(" <- ")}")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming HLL distinct monitor: bounded state, tolerance vs exact, order-invariant across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // 600 distinct users on 'click' (each seen twice — duplicates
      // must not inflate), 40 on 'view'
      val clicks = (1 to 600).flatMap(u =>
        Seq(Event(ts(u), u.toLong, "click", 1.0),
          Event(ts(u + 1), u.toLong, "click", 2.0)))
      val views = (1 to 40).map(u => Event(ts(u), 10000L + u, "view", 1.0))
      def run(batches: Seq[Seq[Event]]): Map[String, (Long, Int)] = {
        val input = MemoryStream[Event]
        val out = scala.collection.mutable.Map.empty[String, (Long, Int)]
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_hll").toFile.getAbsolutePath
        val q = StreamingOps.distinctMonitor(spark, input.toDS())
          .toDF("event_type", "approx_users", "m")
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.as[(String, Long, Int)].collect()
              .foreach { case (k, e, m) => out.synchronized {
                out(k) = (e, m) } }
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
        try batches.foreach { b => input.addData(b: _*); runAll(q) }
        finally q.stop()
        out.synchronized(out.toMap)
      }
      val oneShot = run(Seq(clicks ++ views))
      val split = run(Seq(clicks.take(300), views, clicks.drop(300)))
      // register max-merge is order/batching-invariant: identical
      // estimates however the stream is chopped (the GK sketch can't
      // promise this; HLL can, and this is the pin)
      assert(oneShot == split,
        s"HLL estimate depends on batching: $oneShot vs $split")
      val (cEst, m) = oneShot("click")
      assert(m == 64, "state must be the constant 64 registers")
      assert(math.abs(cEst - 600.0) <= 0.30 * 600,
        s"click estimate $cEst outside 30% of 600 (m=64 → ~13% rse)")
      val (vEst, _) = oneShot("view")
      assert(math.abs(vEst - 40.0) <= 0.30 * 40,
        s"view estimate $vEst outside 30% of 40 (linear-counting range)")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming HLL distinct monitor survives kill + restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_hll_ck")
        .toFile.getAbsolutePath
      val input = MemoryStream[Event]
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      def start() = StreamingOps.distinctMonitor(spark, input.toDS())
        .toDF("event_type", "approx_users", "m")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Long, Int)].collect()
            .foreach(r => out.synchronized { out += r._2 })
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      try {
        input.addData((1 to 300).map(u => Event(ts(u), u.toLong, "click", 1.0)): _*)
        runAll(q1)
      } finally q1.stop()
      val firstEst = out.synchronized(out.last)
      // second half arrives while DOWN; the restart must RESUME the
      // registers — a fresh sketch would estimate ~300, not ~600
      input.addData((301 to 600).map(u => Event(ts(u), u.toLong, "click", 1.0)): _*)
      val q2 = start()
      try runAll(q2) finally q2.stop()
      val resumed = out.synchronized(out.last)
      assert(math.abs(firstEst - 300.0) <= 0.30 * 300, s"pre-kill $firstEst")
      assert(math.abs(resumed - 600.0) <= 0.30 * 600,
        s"sketch state lost across restart: $resumed should read ~600")
      assert(resumed > firstEst, "estimate must grow after recovery")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("dropDuplicatesWithinWatermark dedups the stream on the event key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.dedupedEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      // same (user, type, ts) delivered twice in-batch and once again
      // in the next batch — all within the watermark → one survivor
      input.addData(
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(1), 2L, "click", 2.0))
      runAll(q)
      input.addData(Event(ts(0), 1L, "view", 1.0))
      runAll(q)
      val rows = spark.table("dedup_t")
        .select($"user_id", $"event_type").as[(Long, String)].collect().toSeq
      assert(rows.sorted == Seq((1L, "view"), (2L, "click")).sorted,
        s"duplicate leaked or row dropped: $rows")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to preceding views") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.attributedClicks(input.toDF(), within = "1 hour")
      .writeStream.format("memory").queryName("attr_t")
      .outputMode("append").start()
    try {
      input.addData(
        Event(ts(0), 1L, "view", 0.0),
        Event(ts(20), 1L, "click", 5.0), // within 1h of the view → joins
        Event(ts(90), 1L, "click", 7.0), // 90m after the view → outside
        Event(ts(30), 2L, "click", 9.0)) // no view for user 2
      runAll(q)
      // advance both watermarks so buffered state can be evicted
      input.addData(Event(ts(600), 99L, "view", 0.0),
        Event(ts(600), 99L, "click", 0.0))
      runAll(q)
      val rows = spark.table("attr_t")
        .select($"user_id", $"value").as[(Long, Double)].collect().toSet
      assert(rows.contains((1L, 5.0)), s"in-window click not attributed: $rows")
      assert(!rows.exists(_._2 == 7.0), "out-of-window click attributed")
      assert(!rows.exists(_._1 == 2L), "viewless click attributed")
    } finally q.stop()
  }

  test("streaming canonical-URL dedup keeps the first fetch per canonical form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Long)]
    val q = StreamingOps.dedupedFetches(
        input.toDF().toDF("ts", "url", "fetch_id"))
      .writeStream.format("memory").queryName("urldedup_t")
      .outputMode("append").start()
    try {
      // three raw variants of ONE canonical page + one distinct page
      input.addData(
        (ts(0), "HTTPS://WWW.A.com/p?id=1&utm_source=x", 1L),
        (ts(1), "https://a.com:443/p/?id=1", 2L),
        (ts(2), "https://a.com/p?id=1#frag", 3L),
        (ts(3), "https://b.org/q", 4L))
      runAll(q)
      val kept = spark.table("urldedup_t")
        .select($"canon_url", $"fetch_id").as[(String, Long)]
        .collect().toSet
      // exactly one survivor per canonical form; the a.com family's
      // survivor is the FIRST-arriving fetch
      assert(kept.map(_._1) ==
        Set("https://a.com/p?id=1", "https://b.org/q"), s"kept: $kept")
      assert(kept.contains(("https://a.com/p?id=1", 1L)),
        s"first fetch must survive: $kept")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unconverted views exactly once at watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.viewConversions(input.toDF(),
        within = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("conv_t")
      .outputMode("append").start()
    def rows() = spark.table("conv_t")
      .select($"user_id", $"converted", $"value")
      .as[(Long, Boolean, Option[Double])].collect().toSeq
    try {
      input.addData(
        Event(ts(0), 1L, "view", 0.0),  // converts at +20m
        Event(ts(20), 1L, "click", 5.0),
        Event(ts(0), 2L, "view", 0.0))  // never converts
      runAll(q)
      // the matched row may emit as data arrives; the UNMATCHED view
      // must NOT emit yet — its click could still come until the
      // watermark passes view_ts + 1h + 10m lateness
      assert(!rows().exists(r => r._1 == 2L),
        s"unmatched view emitted before watermark expiry: ${rows()}")
      // nudge BOTH watermarks to +60m (each side's watermark reads
      // only its own filtered slice): still inside user 2's horizon
      input.addData(Event(ts(60), 99L, "view", 0.0),
        Event(ts(60), 99L, "click", 0.0))
      runAll(q)
      assert(!rows().exists(r => r._1 == 2L),
        s"unmatched view emitted while a match was still possible: ${rows()}")
      // push the watermark PAST the horizon → exactly one null-padded
      // emission for user 2 (two extra batches prove no re-emission)
      input.addData(Event(ts(600), 99L, "view", 0.0),
        Event(ts(600), 99L, "click", 0.0))
      runAll(q)
      input.addData(Event(ts(610), 99L, "view", 0.0),
        Event(ts(610), 99L, "click", 0.0))
      runAll(q)
      val r = rows()
      assert(r.count(x => x._1 == 2L) == 1,
        s"unconverted view must emit exactly once: $r")
      assert(r.find(_._1 == 2L).get == ((2L, false, None)),
        s"unmatched emission must be null-padded: $r")
      assert(r.filter(_._1 == 1L) == Seq((1L, true, Some(5.0))),
        s"matched view wrong: $r")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join emits both unmatched sides exactly once at expiry") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.viewClickFullOuter(input.toDF(),
        within = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("fullouter_t")
      .outputMode("append").start()
    def rows() = spark.table("fullouter_t")
      .select($"user_id", $"outcome")
      .as[(Long, String)].collect().toSeq
    try {
      input.addData(
        Event(ts(0), 1L, "view", 0.0),   // converts at +20m
        Event(ts(20), 1L, "click", 5.0),
        Event(ts(0), 2L, "view", 0.0),   // never clicked
        Event(ts(5), 3L, "click", 7.0))  // orphan: no view for user 3
      runAll(q)
      // neither unmatched side may emit while a match is possible
      assert(!rows().exists(r => r._1 == 2L || r._1 == 3L),
        s"unmatched row emitted before watermark expiry: ${rows()}")
      // push both watermarks far past every horizon; two extra
      // batches prove exactly-once emission
      input.addData(Event(ts(600), 99L, "view", 0.0),
        Event(ts(600), 99L, "click", 0.0))
      runAll(q)
      input.addData(Event(ts(610), 99L, "view", 0.0),
        Event(ts(610), 99L, "click", 0.0))
      runAll(q)
      val r = rows()
      assert(r.filter(_._1 == 1L) == Seq((1L, "converted")), s"matched: $r")
      assert(r.filter(_._1 == 2L) == Seq((2L, "unconverted_view")),
        s"view side must emit null-padded exactly once: $r")
      assert(r.filter(_._1 == 3L) == Seq((3L, "orphan_click")),
        s"click side must emit null-padded exactly once: $r")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join survives checkpoint kill/restart without re-emitting") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sslo_ckpt")
      .toFile.getAbsolutePath
    val input = MemoryStream[Event]
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    def start() = StreamingOps.viewConversions(input.toDF(),
        within = "1 hour", lateness = "10 minutes")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val rs = df.select($"user_id", $"converted")
          .as[(Long, Boolean)].collect()
        out.synchronized { rs.foreach { case (u, c) => out += ((batchId, u, c)) } }
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData(
        Event(ts(0), 1L, "view", 0.0),
        Event(ts(20), 1L, "click", 5.0),
        Event(ts(0), 2L, "view", 0.0))
      runAll(q1)
    } finally q1.stop() // kill while user 2's view is still buffered state
    // watermark-advancing data (BOTH sides) arrives while the query
    // is DOWN
    input.addData(Event(ts(600), 99L, "view", 0.0),
      Event(ts(600), 99L, "click", 0.0))
    val q2 = start()
    try {
      runAll(q2)
      input.addData(Event(ts(610), 99L, "view", 0.0),
        Event(ts(610), 99L, "click", 0.0))
      runAll(q2)
    } finally q2.stop()
    val emitted = out.synchronized(out.toList)
    // the buffered unmatched view survived the kill inside the
    // checkpointed state store and expired EXACTLY once post-restart
    assert(emitted.count { case (_, u, _) => u == 2L } == 1,
      s"unmatched view must emit exactly once across restart: $emitted")
    assert(emitted.collect { case (_, 2L, c) => c } == List(false))
    assert(emitted.count { case (_, u, c) => u == 1L && c } == 1,
      s"matched row must not re-emit after recovery: $emitted")
  }

  test("stream-static enrichment join looks up the broadcast dimension per event") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = StreamingOps.enrichedEvents(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    try {
      input.addData(
        Event(ts(0), 1L, "view", 1.0),
        Event(ts(1), 2L, "click", 2.0),
        Event(ts(2), 3L, "view", 3.0)) // user 3 absent from the dim
      runAll(q)
      val rows = spark.table("enrich_t")
        .select($"user_id", $"tier").as[(Long, Option[String])]
        .collect().toSet
      assert(rows == Set((1L, Some("gold")), (2L, Some("silver")), (3L, None)),
        s"enrichment mismatch: $rows")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains available input, stops, and a restart catches up only the new files") {
    // the scheduled-catch-up production pattern: each run processes
    // exactly the files that arrived since the last run's checkpoint,
    // then terminates on its own — incremental batch with streaming's
    // exactly-once bookkeeping (vs processAllAvailable, which needs a
    // manual stop and a long-lived query)
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("avnow_src").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("avnow_ck").toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("avnow_out").toFile.getAbsolutePath
    def catchUp(): Unit = {
      val q = spark.readStream.schema("v LONG").parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        "AvailableNow query must self-terminate once the backlog drains")
    }
    Seq(1L, 2L, 3L).toDF("v").write.mode("append").parquet(src)
    catchUp()
    assert(spark.read.parquet(out).count() == 3)
    Seq(4L, 5L).toDF("v").write.mode("append").parquet(src)
    catchUp()
    // only the two new rows were processed (checkpoint owns progress);
    // nothing re-emitted, nothing missed
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("eventsStream replays the parquet events table as a stream") {
    val out = StreamingOps.tumblingCounts(
      StreamingOps.eventsStream(spark, sfDir), lateness = "0 seconds")
    val q = out.writeStream.format("memory").queryName("replay_t")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      assert(spark.table("replay_t").count() > 0)
    } finally q.stop()
  }

  test("streaming GK quantile monitor: eps-rank guarantee over the stream prefix, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val eps = 0.05
      val q = StreamingOps.quantileMonitor(spark, input.toDS(), eps)
        .toDF("event_type", "n", "p50", "p95", "state_size")
        .writeStream.format("memory").queryName("qm_t")
        .outputMode("update").start()
      try {
        // two batches; the second SHIFTS the distribution so a
        // correct whole-prefix quantile must move — per-batch-only
        // state would report the second batch's median instead
        val batch1 = (1 to 400).map(i => Event(ts(i), i.toLong, "click", i.toDouble))
        val batch2 = (401 to 800).map(i => Event(ts(i), i.toLong, "click", i.toDouble))
        input.addData(batch1: _*); runAll(q)
        input.addData(batch2: _*); runAll(q)
        val rows = spark.table("qm_t")
          .select($"n", $"p50", $"p95", $"state_size")
          .as[(Long, Double, Double, Int)].collect().sortBy(_._1)
        assert(rows.map(_._1).toSeq == Seq(400L, 800L),
          s"one emission per batch with the prefix count: ${rows.toSeq}")
        // exact values are 1..n, so rank(v) = v; GK guarantees the
        // emitted value's rank within eps*n of ceil(phi*n)
        rows.foreach { case (n, p50, p95, size) =>
          val b = eps * n
          assert(math.abs(p50 - math.ceil(0.5 * n)) <= b,
            s"p50 $p50 outside +-$b of ${0.5 * n} at n=$n")
          assert(math.abs(p95 - math.ceil(0.95 * n)) <= b,
            s"p95 $p95 outside +-$b of ${0.95 * n} at n=$n")
          // bounded state: far below n (exact buffering would be n)
          assert(size < 3 * (1 / eps) * (math.log(eps * n + 1) / math.log(2) + 2),
            s"sketch size $size not logarithmic at n=$n")
        }
        // the prefix median MOVED with the second batch — state carried
        assert(rows(1)._2 > rows(0)._2 + 100,
          s"median must shift with the prefix: ${rows.toSeq}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
