package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class EventStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, u: Long, typ: String, v: Double) =
    Event(id, ts(t), u, typ, v)

  test("windowed counts with watermark (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedTypeCounts(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:55:00", 2, "click", 2.0),
        ev(3, "2024-01-01 11:05:00", 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "event_type", "cnt", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      rows shouldBe Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 3.0))
    } finally q.stop()
  }

  test("append mode: watermark finalizes windows and drops late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = graft.streaming.EventStream
      .windowedTypeCounts(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_append")
      .outputMode("append").start()
    try {
      // watermark after this batch: 12:00 - 10min = 11:50 → window
      // [10:00,11:00) is final
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 12:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      // LATE: 10:30 is behind the 11:50 watermark → dropped, must not
      // reopen or alter the finalized window
      input.addData(ev(3, "2024-01-01 10:30:00", 1, "click", 5.0))
      q.processAllAvailable()
      // advance far enough to finalize the 12:00 window too
      input.addData(ev(4, "2024-01-01 14:30:00", 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(ev(5, "2024-01-01 16:30:00", 2, "view", 1.0))
      q.processAllAvailable()
      // keep duplicates (no toSet): re-emission of a finalized window must
      // be visible to the exactly-once count
      val rows = spark.table("win_append")
        .select("window_start", "event_type", "cnt")
        .as[(Timestamp, String, Long)].collect()
      rows should contain((ts("2024-01-01 10:00:00"), "click", 1L)) // late row NOT counted
      rows should contain((ts("2024-01-01 12:00:00"), "click", 1L))
      rows.count(_._1 == ts("2024-01-01 10:00:00")) shouldBe 1 // emitted exactly once
    } finally q.stop()
  }

  test("bounded-lateness randomized replay: appended final state equals batch replay") {
    // the batch-equivalence contract under controlled disorder: 180 events
    // over 3 hours arrive in 6 sorted micro-batches whose INTERNAL order
    // is shuffled (the watermark only advances between batches, so
    // intra-batch disorder can never drop a row); one event arrives hours
    // late (must be DROPPED, not resurrect its finalized window); a final
    // far-future event flushes every real window out of append mode. The
    // streamed output must equal the batch run of the SAME operator over
    // the punctual events only.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    val types = Seq("a", "b", "c")
    val base = (0 until 180).map { i =>
      ev(i.toLong, f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00",
        1L + i % 3, types(rnd.nextInt(3)), (i % 7).toDouble)
    }
    val batches = base.grouped(30).map(b => rnd.shuffle(b)).toSeq
    val late  = ev(999, "2024-01-01 10:00:30", 9, "a", 100.0)
    val flush = ev(1000, "2024-01-02 12:00:00", 9, "z", 0.0)
    val input = MemoryStream[Event]
    val q = EventStream.windowedTypeCounts(input.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("replay_append")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(late); q.processAllAvailable() // behind watermark → dropped
      input.addData(flush); q.processAllAvailable()
      val streamed = spark.table("replay_append")
        .select("window_start", "event_type", "cnt", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect()
      // batch twin: the same operator over the punctual events (the late
      // row is excluded exactly because streaming dropped it; the flush
      // window is excluded because its window is not yet finalized)
      val batchTwin = EventStream
        .windowedTypeCounts(base.toDF(), "30 minutes", "1 hour")
        .select("window_start", "event_type", "cnt", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect()
      streamed.toSet shouldBe batchTwin.toSet
      streamed.length shouldBe batchTwin.length // each window emitted ONCE
    } finally q.stop()
  }

  test("streaming dedup within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.dedupStream(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:00:30", 3, "click", 1.0), // duplicate event_id, other user
        ev(2, "2024-01-01 10:01:00", 2, "view", 2.0))
      q.processAllAvailable()
      // survivors identified by id — a count alone couldn't distinguish
      // deduping on event_id from deduping on user_id
      spark.table("dedup_out").select("event_id").as[Long].collect().sorted shouldBe
        Array(1L, 2L)
    } finally q.stop()
  }

  test("stateful queries run on the RocksDB state store (the at-scale backend)") {
    // Heap state dies when keyspace > executor memory; RocksDB is the
    // production provider. Prove the engine's stateful operators run on it
    // unchanged: same windowed-agg semantics, provider visibly in effect.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStream.windowedTypeCounts(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("rocks_counts")
      .outputMode("complete").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:15:00", 2, "click", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 10:25:00", 3, "click", 4.0))
      q.processAllAvailable() // state must survive across batches in RocksDB
      spark.table("rocks_counts").select("cnt", "sum_value")
        .as[(Long, Double)].collect() shouldBe Array((3L, 7.0))
      // RocksDB provider surfaces its own metrics in the progress event —
      // proof the provider is actually in effect, not silently defaulted
      q.lastProgress.json.toLowerCase should include("rocksdb")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session counts via session_window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionCounts(input.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "a", 0), // session 1 (user 1)
        ev(2, "2024-01-01 10:10:00", 1, "a", 0), // same session (gap < 30m)
        ev(3, "2024-01-01 12:00:00", 1, "a", 0), // new session (gap > 30m)
        ev(4, "2024-01-01 10:00:00", 2, "a", 0))
      q.processAllAvailable()
      val sess = spark.table("sessions")
        .select("user_id", "n_events").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      sess(1L) shouldBe Seq(1L, 2L)
      sess(2L) shouldBe Seq(1L)
    } finally q.stop()
  }

  test("streaming bronze ingest validates arriving CSV files incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_csv").toString
    val q = graft.streaming.EventStream
      .bronzeCsvStream(spark, dir, graft.schema.Contracts.users, "2024-06-01")
      .writeStream.format("memory").queryName("bronze_stream")
      .outputMode("append").start()
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/batch1.csv"),
        "Id,UserName,RegisterDate,Country\nU001,alice,2023-01-01 00:00:00,US\nU002,,2023-01-01 00:00:00,DE\n")
      q.processAllAvailable()
      // second file arrives later — incremental pickup
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/batch2.csv"),
        "Id,UserName,RegisterDate,Country\nU003,carol,2023-02-02 00:00:00,FRA\n")
      q.processAllAvailable()
      val rows = spark.table("bronze_stream")
        .select("user_id", "reject_reason").as[(String, String)].collect().toMap
      rows("U001") shouldBe null
      rows("U002") shouldBe "user_name_is_null"
      rows("U003") shouldBe "country_code_bad_length"
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks    = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = graft.streaming.EventStream
      .purchaseAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      clicks.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 0),
        ev(2, "2024-01-01 08:00:00", 1, "click", 0), // > 1h before → no match
        ev(3, "2024-01-01 10:05:00", 2, "click", 0)) // other user
      purchases.addData(ev(10, "2024-01-01 10:30:00", 1, "purchase", 99.0))
      q.processAllAvailable()
      val rows = spark.table("attribution")
        .select("purchase_id", "click_id").as[(Long, Long)].collect()
      rows shouldBe Array((10L, 1L))
    } finally q.stop()
  }

  test("left-outer stream join: NULL rows emit only on watermark expiry, never twice") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.clickOutcome(
        clicks.toDF(), purchases.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("outer_out")
      .outputMode("append").start()
    def out() = spark.table("outer_out")
      .select("click_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toSet
    try {
      // click 1 matched shortly; click 2 never matched
      clicks.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
        ev(2, "2024-01-01 10:05:00", 2, "click", 0.0))
      purchases.addData(ev(10, "2024-01-01 10:20:00", 1, "purchase", 5.0))
      q.processAllAvailable()
      // the match emits eagerly; click 2's outer row must NOT appear yet —
      // a purchase could still arrive inside its interval
      out() shouldBe Set((1L, Some(10L)))
      // advance BOTH watermarks far past click 2's interval + delay
      clicks.addData(ev(3, "2024-01-01 14:00:00", 9, "click", 0.0))
      purchases.addData(ev(11, "2024-01-01 14:00:00", 9, "purchase", 1.0))
      q.processAllAvailable()
      val now = out()
      now should contain((2L, None)) // watermark-emitted NULL row
      // click 1 appears EXACTLY once, matched — never also null-extended
      now.count(_._1 == 1L) shouldBe 1
    } finally q.stop()
  }

  test("foreachBatch sink routes valid/reject rows to parquet per batch") {
    val dir  = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val outV = s"$dir/valid"; val outR = s"$dir/rejects"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val tagged = graft.streaming.EventStream
      .bronzeCsvStream(spark, s"$dir/in", graft.schema.Contracts.users, "2024-06-01")
    val q = graft.streaming.EventStream
      .writeValidatedStream(tagged, outV, outR, s"$dir/ckpt")
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/in/f1.csv"),
        "Id,UserName,RegisterDate,Country\nU001,alice,2023-01-01 00:00:00,US\nU002,,2023-01-01 00:00:00,DE\n")
      q.processAllAvailable()
      spark.read.parquet(outV).select("user_id").as[String].collect() shouldBe
        Array("U001")
      spark.read.parquet(outR).select("user_id", "reject_reason")
        .as[(String, String)].collect() shouldBe Array(("U002", "user_name_is_null"))
    } finally q.stop()
  }

  test("custom state: running per-user stats accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("update").start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1, "a", 1.5))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 10:01:00", 1, "a", 2.5))
      q.processAllAvailable()
      val last = spark.table("user_stats")
        .filter($"user_id" === 1L)
        .orderBy($"n_events".desc).limit(1)
        .select("n_events", "total_value").as[(Long, Double)].head()
      last shouldBe ((2L, 4.0))
    } finally q.stop()
  }

  test("session replay: an event at EXACTLY gap distance MERGES (adjacent windows)") {
    // Spark's session_window merges on OVERLAP-OR-ADJACENCY: an event at
    // exactly last_ts + gap extends the session (empirically pinned here —
    // the intuitive half-open [start, end) reading predicts a split and is
    // WRONG; the oracle therefore breaks on diff > gap, matching the batch
    // Sessionize boundary). Real micros-precision data never hits the
    // boundary, so only this deterministic case pins it.
    val tmp = java.nio.file.Files.createTempDirectory("graft_session_edge")
    try {
      val events = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0), // == gap → merge
        (3L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0),
        (4L, ts("2024-01-01 11:00:01"), 2L, "click", 1.0)) // > gap → new
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = EventStream.replaySessionWindow(events, tmp.toString + "/stage",
          nFiles = 2, gap = "1 hour", gapHoursForSentinel = 1)
        .select($"user_id", $"session_start".cast("string"),
          $"session_end".cast("string"), $"n_events")
        .as[(Long, String, String, Long)].collect().toSet
      out shouldBe Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00", 2L),
        (2L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 1L),
        (2L, "2024-01-01 11:00:01", "2024-01-01 12:00:01", 1L))
    } finally graft.core.Fs.rmTree(tmp.toFile)
  }

  test("custom session (flatMapGroupsWithState): exactly-gap MERGES, gap+1s splits, timeout flushes") {
    // the same deterministic boundary the session_window spec pins — the
    // two implementations must agree at the adjacency edge, and the
    // trailing sessions here close via EVENT-TIME TIMEOUT (no successor
    // ever arrives; the sentinel-advanced watermark fires the callback)
    val tmp = java.nio.file.Files.createTempDirectory("graft_custom_session")
    try {
      val events = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 11:00:00"), 1L, "click", 2.0), // == gap → merge
        (3L, ts("2024-01-01 10:00:00"), 2L, "click", 4.0),
        (4L, ts("2024-01-01 11:00:01"), 2L, "click", 8.0)) // > gap → new
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = EventStream.replayCustomSession(events,
          tmp.toString + "/stage", nFiles = 2, gapSec = 3600L)
        .select($"user_id", $"session_start".cast("string"),
          $"session_end".cast("string"), $"n_events", $"value_cents")
        .as[(Long, String, String, Long, Long)].collect().toSet
      out shouldBe Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00", 2L, 300L),
        (2L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 1L, 400L),
        (2L, "2024-01-01 11:00:01", "2024-01-01 12:00:01", 1L, 800L))
    } finally graft.core.Fs.rmTree(tmp.toFile)
  }

  test("custom session: a late bridging event MERGES two open fragments into one session") {
    // the case the round-11 single-open-session fold could NOT express:
    // events A (10:00) and C (12:00) arrive FIRST (file 0) — two disjoint
    // fragments under a 1 h gap — then B (11:00) arrives LATE (file 1),
    // adjacent to BOTH, bridging them into ONE session. B is in-watermark
    // on arrival (watermark after file 0 = 12:00 − 6 h). A fold that
    // closed A's fragment when C arrived emits a phantom 1-event session
    // AND a wrong merged one; the islands state merges exactly once.
    val tmp = java.nio.file.Files.createTempDirectory("graft_session_bridge")
    try {
      val events = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, 0),
        (3L, ts("2024-01-01 12:00:00"), 1L, "click", 4.0, 0),
        (2L, ts("2024-01-01 11:00:00"), 1L, "click", 2.0, 1), // the bridge
        // control key: fragments that stay disjoint must still split
        (5L, ts("2024-01-01 10:00:00"), 2L, "click", 8.0, 0),
        (6L, ts("2024-01-01 12:00:01"), 2L, "click", 16.0, 1))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "__file")
      val out = EventStream.replayCustomSession(events,
          tmp.toString + "/stage", gapSec = 3600L, watermarkHours = 6,
          arrivalCol = Some("__file"))
        .select($"user_id", $"session_start".cast("string"),
          $"session_end".cast("string"), $"n_events", $"value_cents")
        .as[(Long, String, String, Long, Long)].collect().toSet
      out shouldBe Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 13:00:00", 3L, 700L),
        (2L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 1L, 800L),
        (2L, "2024-01-01 12:00:01", "2024-01-01 13:00:01", 1L, 1600L))
    } finally graft.core.Fs.rmTree(tmp.toFile)
  }

  test("dedup replay drops a duplicate arriving in a LATER micro-batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dedup_edge")
    try {
      // two files split by ts; event 1's copy lands in file 2 (+6 h,
      // within the 12 h watermark) — cross-batch state must drop it
      val events = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 11:00:00"), 1L, "view", 2.0),
        (1L, ts("2024-01-01 16:00:00"), 1L, "click", 1.0),
        (3L, ts("2024-01-01 17:00:00"), 2L, "click", 3.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = EventStream.replayDedupStream(events, tmp.toString + "/stage",
          nFiles = 2, watermarkHours = 12)
        .select($"event_id", $"value_cents")
        .as[(Long, Long)].collect().sorted
      out shouldBe Seq((1L, 100L), (2L, 200L), (3L, 300L))
    } finally graft.core.Fs.rmTree(tmp.toFile)
  }

  test("TxLog streaming source: commit-ordered, orphan-blind, append-only") {
    import graft.gold.TxLog
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_txsrc")
    val table = tmp.toString + "/table"
    try {
      def slice(r: Range) = r.map(i =>
          (i.toLong, ts(s"2024-01-0${1 + i % 2} 10:00:00"), "click", 100L))
        .toDF("event_id", "ts", "event_type", "value_cents")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      TxLog.init(slice(0 until 10), table)
      TxLog.append(slice(10 until 30), table, 0L)
      // a crashed writer's uncommitted leftovers — never committed, must
      // never be served
      slice(100 until 200).write.mode("append").parquet(table)
      val out = EventStream.replayTxLogIncremental(spark, table,
          tmp.toString + "/work", windowDur = "1 day")
        .select($"window_start".cast("string"), $"cnt", $"value_cents")
        .as[(String, Long, Long)].collect().toSet
      out shouldBe Set(
        ("2024-01-01 00:00:00", 15L, 1500L), // even ids of 0..29
        ("2024-01-02 00:00:00", 15L, 1500L))
      // append-only contract: a remove-action version fails the query,
      // loudly (the incremental source raises from inside the stream)
      TxLog.deleteWhere(spark, table, col("event_id") < 5L, 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        EventStream.replayTxLogIncremental(spark, table, tmp.toString + "/work2")
      }
      e.getMessage should include("APPEND-ONLY")
    } finally graft.core.Fs.rmTree(tmp.toFile)
  }

  test("TxLog streaming sink: restart from checkpoint commits nothing twice") {
    import graft.gold.TxLog
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_txsink_restart")
    val stage = tmp.toString + "/stage"
    val table = tmp.toString + "/table"
    val ckpt = tmp.toString + "/ckpt"
    try {
      def staged(r: Range) = r.map(i =>
          (i.toLong, ts(f"2024-01-01 ${10 + i % 10}%02d:00:00"), i % 3L,
            "click", i.toLong))
        .toDF("event_id", "ts", "user_id", "event_type", "value_cents")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val schema = staged(0 until 1).schema
      TxLog.init(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), table)
      // one streaming "run": a fresh query over the SAME checkpoint — the
      // file source resumes from its seen-files log, batchIds continue
      def runOnce(): Unit = {
        val child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", 4)
        val q = child.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
              TxLog.commitWithRetry(table)(v =>
                TxLog.appendIfNew(b.toDF(), table, "restart-app", bid, v))
              ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      staged(0 until 40).coalesce(2).write.mode("append").parquet(stage)
      runOnce()
      TxLog.read(spark, table).count() shouldBe 40L
      // restart with NO new input: any redelivery must no-op
      runOnce()
      TxLog.read(spark, table).count() shouldBe 40L
      // new files arrive, restart from the same checkpoint: only the new
      // rows commit, exactly once each
      staged(40 until 70).coalesce(2).write.mode("append").parquet(stage)
      runOnce()
      val rows = TxLog.read(spark, table)
      rows.count() shouldBe 70L
      rows.select("event_id").distinct().count() shouldBe 70L
    } finally graft.core.Fs.rmTree(tmp.toFile)
  }

  test("TxLog sink: a crash BETWEEN appendIfNew and checkpoint commit redelivers as a no-op (seeded)") {
    // The at-least-once race the inline double-apply cannot time: the sink
    // effect (appendIfNew) SUCCEEDS, then the query dies BEFORE the engine
    // commits the batch to its checkpoint. On restart Structured Streaming
    // redelivers the SAME batchId — the txn watermark must make it a no-op.
    // Seeded: the crash batch varies, so the race is exercised at the
    // first, a middle, and the last batch of the stream.
    import graft.gold.TxLog
    import org.apache.spark.sql.functions._
    (0 until 4).foreach { seed =>
      val rng = new java.util.Random(0x5eedL * 31 + seed)
      val nFiles = 4
      val killAt = rng.nextInt(nFiles).toLong
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_txsink_crash$seed")
      val stage = tmp.toString + "/stage"
      val table = tmp.toString + "/table"
      val ckpt = tmp.toString + "/ckpt"
      try {
        def staged(r: Range) = r.map(i =>
            (i.toLong, ts(f"2024-01-01 ${10 + i % 10}%02d:00:00"), i % 3L,
              "click", i.toLong))
          .toDF("event_id", "ts", "user_id", "event_type", "value_cents")
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
        val schema = staged(0 until 1).schema
        TxLog.init(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), table)
        // one file per micro-batch, written with distinct mod times
        (0 until nFiles).foreach { f =>
          staged(f * 10 until f * 10 + 10).coalesce(1)
            .write.mode("append").parquet(stage)
          Thread.sleep(25) // distinct mod times → deterministic batch order
        }
        val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def runOnce(kill: Boolean): Unit = {
          val child = spark.newSession()
          child.conf.set("spark.sql.shuffle.partitions", 4)
          val q = child.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(stage)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
                TxLog.commitWithRetry(table)(v =>
                  TxLog.appendIfNew(b.toDF(), table, "crash-app", bid, v))
                // the injected crash: AFTER the sink-side commit landed,
                // BEFORE the engine checkpoints the batch
                if (kill && bid == killAt && killed.compareAndSet(false, true))
                  throw new RuntimeException(
                    s"injected crash after appendIfNew(batch $bid)")
                ()
            }
            .start()
          try q.processAllAvailable() finally q.stop()
        }
        withClue(s"seed $seed (crash at batch $killAt): ") {
          val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            runOnce(kill = true)
          }
          e.getMessage should include("injected crash")
          // the crashed batch's rows ARE in the table (the sink-side
          // commit landed before the crash): batches 0..killAt committed
          TxLog.read(spark, table).count() shouldBe (killAt + 1) * 10L
          TxLog.snapshot(table).txns shouldBe Map("crash-app" -> killAt)
          // …and the restart redelivers it as a NO-OP, then finishes
          runOnce(kill = false)
          val rows = TxLog.read(spark, table)
          rows.count() shouldBe (nFiles * 10).toLong
          rows.select("event_id").distinct().count() shouldBe (nFiles * 10).toLong
          // exactly one commit per batch + init: the redelivery added none
          TxLog.currentVersion(table) shouldBe Some(nFiles.toLong)
          TxLog.snapshot(table).txns shouldBe
            Map("crash-app" -> (nFiles - 1).toLong)
        }
      } finally graft.core.Fs.rmTree(tmp.toFile)
    }
  }
}
