package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension (the reference lists streaming as future
  * work, Meta_Guideline.md:4717 — this is the Spark-native answer).
  *
  * Patterns covered:
  *  - watermarked tumbling-window aggregation (the streaming A1/A2)
  *  - watermark-bounded streaming dedup (the streaming W1)
  *  - session windows via the built-in `session_window` (codegen'd)
  *  - custom state via `mapGroupsWithState` (running per-key stats)
  *
  * All transforms are source-agnostic: the same code runs on
  * `readStream.parquet/kafka/...` in production and on a MemoryStream in
  * tests. At scale the state store shuffles by key once; watermarks bound
  * state size — no unbounded buffering.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  /** Tumbling-window counts per event type, watermark-bounded. */
  def windowedTypeCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowDur: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Batch-equivalence replay of the tumbling-window aggregate — the
    * contract every production streaming pipeline owes its batch twin:
    * stage `events` as `nFiles` time-ranged parquet files, stream them
    * back ONE FILE PER MICRO-BATCH through the windowed aggregation
    * (complete mode, so state is maintained incrementally across all
    * micro-batches and the final table is the full window set), and
    * return that final state as a static frame. Gated as
    * `q_o_stream_window_replay`: the DuckDB oracle computes the same
    * epoch-aligned tumbling windows directly over the events table, so a
    * state-loss across batches, a window misalignment, or a double-counted
    * micro-batch all hash-mismatch. Money stays in exact cents
    * (order-free integer sums — double summation order across state
    * merges would not be hash-stable). Append-mode watermark semantics
    * (late-drop, finalize-once) are pinned by EventStreamSpec's
    * bounded-lateness replay, where arrival order is controlled.
    */
  def replayWindowedAgg(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      windowDur: String = "1 day",
      arrivalCol: Option[String] = None
  ): DataFrame = {
    val s = events.sparkSession
    val stagedAll = events.select((Seq(col("event_id"), col("ts"),
      col("event_type"), col("value")) ++ arrivalCol.map(col)): _*)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None =>
        stagedAll.repartitionByRange(nFiles, col("ts"), col("event_id"))
          .write.mode("overwrite").parquet(stagePath)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    // The stream runs on a CHILD session with few shuffle partitions:
    // state-store partition count is pinned at query start by
    // spark.sql.shuffle.partitions, and a default-200-partition stateful
    // query over 6 micro-batches is thousands of near-empty state tasks —
    // pure scheduling overhead (round-7 driver record: 10-88 s wall vs
    // single-digit cpu). The conf is scoped to the child (the
    // SqlFront.registerMetaBronze pattern), never mutated on the caller's
    // session.
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val agg = stream
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("window.end").cast("timestamp_ntz").as("window_end"),
        col("event_type"), col("cnt"), col("value_cents"))
    // Materialization stays DISTRIBUTED: complete-mode foreachBatch
    // overwrites the parquet output with the full current state each
    // micro-batch (state is window-count scale, so each rewrite is small),
    // and the final overwrite IS the final state — nothing is ever
    // collect()ed to the driver.
    val outPath = stagePath + "_out"
    val ckpt = stagePath + "_ckpt"
    Seq(outPath, ckpt).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    val q = agg.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(outPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    readReplayOutput(s, outPath, agg.schema)
  }

  /** APPEND-MODE twin of [[replayWindowedAgg]] — the OTHER watermark
    * semantics class: each window is emitted EXACTLY ONCE, when the
    * watermark proves it closed (finalize-once), instead of the complete
    * mode's full-state rewrite. The subtle end-of-stream part: after the
    * last real file the watermark sits `watermarkHours` behind max(ts),
    * so the final windows would never flush — a far-future sentinel row
    * (its own `__sentinel` event type, filtered from the returned frame)
    * pushes the watermark past every real window's end, and Spark's
    * no-data micro-batches emit the remainder. With in-order (or
    * slack-bounded out-of-order, via `arrivalCol`) delivery nothing is
    * watermark-late, so the emitted set must equal the FULL batch window
    * set — a double emission (window flushed twice across batches), a
    * missing flush, or a late-drop all diverge. Gated as
    * `q_o_stream_append_replay` against the same batch-window oracle as
    * the complete-mode gate.
    */
  def replayWindowedAggAppend(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      windowDur: String = "1 day",
      watermarkHours: Int = 2,
      sentinelLeadHours: Int = 34, // > windowDur + watermark for the default gate
      arrivalCol: Option[String] = None
  ): DataFrame = {
    val s = events.sparkSession
    val stagedAll = events.select((Seq(col("event_id"),
      col("ts").cast("timestamp").as("ts"),
      col("event_type"), col("value")) ++ arrivalCol.map(col)): _*)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    val maxTs = staged.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    if (maxTs != null) {
      val farFuture = new java.sql.Timestamp(
        maxTs.getTime + sentinelLeadHours.toLong * 3600 * 1000)
      import s.implicits._
      val sentinel = Seq((Long.MinValue, farFuture, "__sentinel", 0.0))
        .toDF("event_id", "ts", "event_type", "value")
      appendSentinelFile(sentinel, stagePath)
    }
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val agg = stream
      .withWatermark("ts", s"$watermarkHours hours")
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("window.end").cast("timestamp_ntz").as("window_end"),
        col("event_type"), col("cnt"), col("value_cents"))
    // drop ONLY the sentinel's own group — a NULL event_type group (legal
    // data the batch oracle keeps) must survive, so the null case is
    // explicit (a bare =!= would evaluate NULL and drop it)
    runReplayToParquet(s, agg, stagePath)
      .filter(col("event_type").isNull || col("event_type") =!= "__sentinel")
  }

  /** Batch-equivalence replay of STATEFUL STREAMING DEDUP
    * (`dropDuplicatesWithinWatermark`): stage `events` — which the CALLER
    * has salted with duplicate event_ids, displaced at most
    * (watermark − ε) later in event time — as time-ordered files, stream
    * them one file per micro-batch, and drop duplicates on `event_id`
    * with watermark-bounded state. First occurrences emit eagerly (dedup
    * is not an aggregation — no end-of-stream sentinel needed); every
    * later copy of a key arriving within the watermark delay is dropped
    * by state that is still alive (the in-order replay's watermark trails
    * maxTs by the full delay, so a displacement < delay can never meet
    * evicted state). Gated as `q_o_stream_dedup_replay`: the DuckDB
    * oracle is the original pre-salt events — a missed duplicate (row
    * emitted twice), a dropped unique row, or premature state eviction
    * all hash-mismatch.
    */
  def replayDedupStream(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      watermarkHours: Int = 2,
      arrivalCol: Option[String] = None
  ): DataFrame = {
    val s = events.sparkSession
    val stagedAll = stageEvents(events, arrivalCol)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val dedup = stream
      .withWatermark("ts", s"$watermarkHours hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
    runReplayToParquet(s, dedup, stagePath)
  }

  /** Batch-equivalence replay of the SESSION-WINDOW aggregation — the
    * streaming window class whose extent is DATA-DEPENDENT (a session
    * grows until a `gap`-sized silence), unlike the fixed tumbling
    * windows of [[replayWindowedAgg]]. Append mode: a session emits
    * exactly once, when the watermark proves no event can extend it;
    * in-order replay means partial sessions only ever EXTEND (no
    * cross-batch merge of disjoint fragments is needed for equivalence,
    * though the engine supports it). End-of-stream flush via the same
    * far-future sentinel as [[replayWindowedAggAppend]], on its own
    * impossible user key. Gated as `q_o_stream_session_replay` against
    * DuckDB's classic gap-islands sessionization (lag-diff breaks +
    * running sum) — a session split at a micro-batch boundary, a
    * double-emitted session, or a gap-boundary off-by-one (Spark merges
    * on overlap-or-ADJACENCY: an event at exactly last + gap EXTENDS the
    * session, spec-pinned in EventStreamSpec) all hash-mismatch.
    */
  def replaySessionWindow(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      gap: String = "6 hours",
      gapHoursForSentinel: Int = 6,
      watermarkHours: Int = 2,
      arrivalCol: Option[String] = None
  ): DataFrame = {
    val s = events.sparkSession
    val stagedAll = stageEvents(events, arrivalCol)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    val maxTs = staged.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    if (maxTs != null) {
      // past every real session's flush bound max(ts) + gap + watermark
      val farFuture = new java.sql.Timestamp(maxTs.getTime +
        (gapHoursForSentinel + watermarkHours + 8L) * 3600 * 1000)
      import s.implicits._
      val sentinel = Seq((SentinelId, farFuture, Long.MinValue, "__sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      appendSentinelFile(sentinel, stagePath)
    }
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val agg = stream
      .withWatermark("ts", s"$watermarkHours hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("value_cents"))
    // null-safe: a NULL-keyed session group is legal data the batch
    // oracle keeps; only the sentinel's own impossible key is dropped
    runReplayToParquet(s, agg, stagePath)
      .filter(!(col("user_id") <=> lit(Long.MinValue)))
  }

  /** Batch-equivalence replay of CUSTOM STREAMING STATE
    * (`mapGroupsWithState` — the KeyValueGroupedDataset path for
    * semantics no built-in window expresses): running per-user
    * (event count, value cents) totals, update-mode. Each micro-batch
    * emits a refreshed row per user seen in it; the foreachBatch sink
    * appends every update, and the FINAL state per user is selected
    * back by max(n_events) — the running count is strictly monotone per
    * user, so the maximum IS the last update, with no reliance on file
    * order. Gated as `q_o_stream_running_stats` against the plain batch
    * groupBy: lost state between micro-batches, a double-applied batch,
    * or a key-routing bug all hash-mismatch.
    */
  def replayRunningStats(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      arrivalCol: Option[String] = None
  ): DataFrame = {
    val s = events.sparkSession
    val stagedAll = stageEvents(events, arrivalCol)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    import child.implicits._
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
      .select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[CentsEvent]
    val updates = stream
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserCents, UserCents](GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[CentsEvent], state: GroupState[UserCents]) =>
          val prev = state.getOption.getOrElse(UserCents(user, 0L, 0L))
          var n = prev.n_events; var c = prev.value_cents
          batch.foreach { e => n += 1; c += e.cents }
          val next = UserCents(user, n, c)
          state.update(next)
          next
      }
    val outPath = stagePath + "_out"
    val ckpt = stagePath + "_ckpt"
    Seq(outPath, ckpt).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    // mapGroupsWithState only supports update-mode output, which the file
    // sink does not — foreachBatch appends each batch's refreshed rows
    val q = updates.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(outPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val all = readReplayOutput(s, outPath,
      org.apache.spark.sql.Encoders.product[UserCents].schema)
    all.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("value_cents"), col("n_events")).as("value_cents"))
  }

  final case class CentsEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, cents: Long)
  final case class UserCents(user_id: Long, n_events: Long, value_cents: Long)

  /** One session fragment for [[replayCustomSession]] (epoch MICROS —
    * `Timestamp.getTime` is millis and would silently truncate the
    * events' microsecond precision; the oracle compares exact).
    */
  final case class SessionState(start: Long, last: Long, n: Long, cents: Long)

  /** [[replayCustomSession]] state: the key's OPEN session fragments as
    * disjoint, start-ordered islands. In-order input keeps this a single
    * island; out-of-order (but in-watermark) input can hold several
    * disjoint fragments that a later bridging event MERGES — the part a
    * single-open-session fold cannot express. Bounded: an island closes
    * (emits, leaves the state) as soon as the watermark proves no
    * in-watermark event can extend it, so the retained fragment count is
    * capped by the arrival disorder inside one watermark window, not by
    * stream length.
    */
  final case class SessionIslands(islands: Seq[SessionState])

  private def microsOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  /** `user_id` is an Option: a NULL user key is legal data whose events
    * form their own session group (matching both `session_window` and the
    * gap-islands twin's PARTITION BY) — a bare Long would throw on it.
    */
  final case class SessionOut(user_id: Option[Long],
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, value_cents: Long)

  final case class NKCentsEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Option[Long], event_type: String, cents: Long)

  /** CUSTOM-STATE sessionization via `flatMapGroupsWithState` +
    * EVENT-TIME TIMEOUT — the same session semantics as
    * [[replaySessionWindow]] built from the general state API instead of
    * the `session_window` operator, gated against the SAME DuckDB
    * gap-islands oracle so the two implementations pin each other.
    *
    * State = the key's open session FRAGMENTS as disjoint start-ordered
    * islands ([[SessionIslands]]): each batch's events become point
    * islands, and one sorted merge folds everything adjacent-or-closer
    * than `gap` together — so a late (but in-watermark) event that lands
    * BETWEEN two fragments bridges them into one session, the case a
    * single-open-session fold gets wrong. Boundary matches
    * session_window's merge-on-adjacency: an event at EXACTLY `last +
    * gap` EXTENDS (`diff <= gap`).
    *
    * Emission is WATERMARK-DRIVEN only: an island closes when the
    * watermark passes `last + gap` — a successor event no longer proves
    * closure under out-of-order delivery (a gap-filling event may still
    * arrive), so islands are emitted either inline (the close check runs
    * on every invocation) or by the event-time timeout callback, which is
    * re-armed to the earliest remaining island's close bound. The
    * `setTimeoutTimestamp` must-exceed-watermark precondition holds by
    * construction: any island whose close bound is at or below the
    * current watermark was just closed, so the re-armed bound is strictly
    * above. End-of-stream flush: the far-future sentinel advances the
    * watermark and the final no-data batch fires every remaining timeout;
    * the sentinel's own state (impossible user key, close bound beyond
    * the final watermark) never emits and its key is filtered from the
    * output.
    *
    * Out-of-order contract (the round-11 limitation, now lifted): with
    * `arrivalCol`, files replay in ARRIVAL order and rows may arrive
    * event-time-late; as long as every row is in-watermark on arrival
    * (the StreamFuzzer late generator's bound) the result equals the
    * batch gap-islands twin exactly. Rows behind the watermark are
    * dropped by the engine BEFORE the state fold — diverging from batch
    * by the same contract as every watermarked operator.
    */
  def replayCustomSession(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      gapSec: Long = 6L * 3600,
      watermarkHours: Int = 2,
      arrivalCol: Option[String] = None
  ): DataFrame = {
    val s = events.sparkSession
    val stagedAll = stageEvents(events, arrivalCol)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    val maxTs = staged.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    if (maxTs != null) {
      val farFuture = new java.sql.Timestamp(maxTs.getTime +
        (gapSec + (watermarkHours + 8L) * 3600) * 1000)
      import s.implicits._
      val sentinel = Seq((SentinelId, farFuture, Long.MinValue, "__sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      appendSentinelFile(sentinel, stagePath)
    }
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    import child.implicits._
    val gapUs = gapSec * 1000000L
    // The sentinel is NOT filtered before grouping: a pre-group filter on
    // a non-event-time column gets predicate-pushed BELOW the
    // EventTimeWatermark node, so the sentinel would never advance the
    // watermark and no timeout would ever fire (observed: only
    // successor-closed sessions emitted). It flows through, opens its own
    // state under the impossible user key (whose timeout, sentinel + gap,
    // stays beyond the final watermark — never emitted), and the OUTPUT
    // is filtered on that key instead.
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
      .withWatermark("ts", s"$watermarkHours hours")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[NKCentsEvent]
    val sessions = stream.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionIslands, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Option[Long], batch: Iterator[NKCentsEvent], state: GroupState[SessionIslands]) =>
          def emit(st: SessionState) = SessionOut(user,
            tsOfMicros(st.start), tsOfMicros(st.last + gapUs), st.n, st.cents)
          // millis CEIL of an island's close bound `last + gap`: the
          // timeout API is millis — ceil so a flush can never fire a hair
          // BEFORE the bound, and the close test uses the SAME value so
          // "closable now" and "needs a future timeout" exactly partition
          // the islands (a gap would strand one; an overlap would arm a
          // timeout at-or-below the watermark, which Spark rejects)
          def closeBoundMs(st: SessionState): Long =
            Math.floorDiv(st.last + gapUs, 1000L) + 1L
          // merge fragments + new points in one sorted fold — adjacency
          // (diff <= gap) EXTENDS, matching session_window. Materializes
          // ONE key's islands + ONE micro-batch slice (bounded by trigger
          // size and in-window disorder, not stream length).
          val points = batch.map(e =>
            SessionState(microsOf(e.ts), microsOf(e.ts), 1L, e.cents)).toSeq
          val all = (state.getOption.map(_.islands).getOrElse(Nil) ++ points)
            .sortBy(st => (st.start, st.last))
          val merged = all.foldLeft(List.empty[SessionState]) {
            case (cur :: done, nxt) if nxt.start - cur.last <= gapUs =>
              SessionState(cur.start, math.max(cur.last, nxt.last),
                cur.n + nxt.n, cur.cents + nxt.cents) :: done
            case (acc, nxt) => nxt :: acc
          }.reverse
          // close every island the watermark proves un-extendable: any
          // extending event would be engine-dropped as late before
          // reaching this fold
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(st => closeBoundMs(st) <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionIslands(open))
            state.setTimeoutTimestamp(open.map(closeBoundMs).min)
          }
          closed.iterator.map(emit)
      }
      .filter(!(col("user_id") <=> lit(Long.MinValue)))
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("value_cents"))
    runReplayToParquet(s, sessions, stagePath)
  }

  /** EXACTLY-ONCE streaming ingestion into a [[graft.gold.TxLog]] table —
    * the sink side of the streaming surface: each micro-batch commits
    * through `TxLog.appendIfNew` tagged `(appId, batchId)` (the Delta
    * txn-action pattern), so a redelivered batch — the at-least-once
    * delivery `foreachBatch` gives after any sink-side retry — commits
    * NOTHING the second time. To make that observable rather than
    * assumed, the replay DELIBERATELY applies every batch TWICE with the
    * same batchId; the second call must be a no-op against the recorded
    * per-app watermark. Gated as `q_o_stream_txlog_sink`: the oracle is
    * the plain events projection, so any idempotency leak doubles rows
    * and any lost batch drops them. `nFiles` defaults past the log's
    * checkpoint interval so the gate read also resolves through a
    * checkpoint carrying the txn watermark.
    */
  def replayIntoTxLog(
      events: DataFrame,
      stagePath: String,
      tablePath: String,
      nFiles: Int = 12,
      appId: String = "graft-stream-ingest"
  ): DataFrame = {
    val s = events.sparkSession
    val staged = events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"),
      col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"))
    writeTimeOrderedFiles(staged, stagePath, nFiles)
    graft.core.Fs.rmTree(new java.io.File(tablePath))
    graft.gold.TxLog.init(
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        staged.schema), tablePath)
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val ckpt = stagePath + "_ckpt"
    graft.core.Fs.rmTree(new java.io.File(ckpt))
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val data = batch.persist()
        try {
          // commitWithRetry because a table is shared infrastructure:
          // the skip check re-runs against the fresh snapshot on every
          // optimistic-conflict retry
          graft.gold.TxLog.commitWithRetry(tablePath)(v =>
            graft.gold.TxLog.appendIfNew(data.toDF(), tablePath, appId, bid, v))
          // the deliberate redelivery: same (appId, batchId) → no-op
          graft.gold.TxLog.commitWithRetry(tablePath)(v =>
            graft.gold.TxLog.appendIfNew(data.toDF(), tablePath, appId, bid, v))
          ()
        } finally { data.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.gold.TxLog.read(s, tablePath)
  }

  /** The same exactly-once ingestion through the DECLARATIVE sink format
    * (`writeStream.format("graft-txlog")`, [[TxLogSink]]) — and, unlike
    * [[replayIntoTxLog]]'s inline double-apply, with a REAL engine-level
    * redelivery driven through the crash window: the first run carries the
    * sink's fault-injection option and DIES after `appendIfNew` commits
    * batch `nFiles/2` but before the engine writes that batch's commit
    * marker (exactly the at-least-once window); the restart from the same
    * checkpoint redelivers that batch — the txn watermark must no-op it —
    * then drains the remaining files. Gated as `q_o_stream_txlog_sink_fmt`
    * against the plain events projection: a watermark miss double-counts
    * the redelivered batch, a lost batch drops rows, both hash-mismatch.
    * The crash is REQUIRED to have fired (loud error otherwise) so the
    * gate can never silently degrade into a plain single-run replay.
    */
  def replayIntoTxLogFormatSink(
      events: DataFrame,
      stagePath: String,
      tablePath: String,
      nFiles: Int = 12,
      appId: String = "graft-stream-ingest-fmt"
  ): DataFrame = {
    val s = events.sparkSession
    val staged = events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"),
      col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"))
    writeTimeOrderedFiles(staged, stagePath, nFiles)
    graft.core.Fs.rmTree(new java.io.File(tablePath))
    graft.gold.TxLog.init(
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        staged.schema), tablePath)
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val ckpt = stagePath + "_ckpt"
    graft.core.Fs.rmTree(new java.io.File(ckpt))
    def run(fault: Option[Long]): Boolean = {
      var w = child.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stagePath)
        .writeStream.format("graft-txlog")
        .option("path", tablePath)
        .option("appId", appId)
        .option("checkpointLocation", ckpt)
      fault.foreach(k => w = w.option(TxLogSink.FaultInjectKey, k.toString))
      val q = w.start()
      try { q.processAllAvailable(); false }
      catch {
        // the injected crash surfaces as the query's failure; anything
        // else (a real bug) must keep propagating
        case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("INJECTED failure") => true
      } finally q.stop()
    }
    val crashed = run(fault = Some(nFiles / 2L))
    require(crashed, "replayIntoTxLogFormatSink: the injected crash did " +
      "not fire - the redelivery path was not exercised")
    val crashedAgain = run(fault = None)
    require(!crashedAgain,
      "replayIntoTxLogFormatSink: restart run failed unexpectedly")
    graft.gold.TxLog.read(s, tablePath)
  }

  /** The INCREMENTAL TxLog streaming source ([[TxLogSource]]) as a
    * readStream — offset = log version, batches read each commit's add
    * files IN PLACE (no staging copy), resumable from the engine
    * checkpoint. `maxVersionsPerTrigger` bounds commits per micro-batch
    * (Delta's `maxFilesPerTrigger` role).
    */
  def streamTxLogTable(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      maxVersionsPerTrigger: Long = 1L
  ): DataFrame =
    spark.readStream.format("graft-txlog")
      .option("path", tablePath)
      .option(TxLogSource.MaxVersionsKey, maxVersionsPerTrigger.toString)
      .load()

  /** Drive the incremental TxLog source through the windowed aggregation
    * WITH a mid-log stop/restart — the resume proof
    * [[replayTxLogAppends]]' copy-based harness could not give:
    *
    *   1. run the query over every version committed so far (one commit
    *      per micro-batch), `processAllAvailable`, STOP;
    *   2. run `between()` — the caller appends MORE versions while the
    *      query is down;
    *   3. restart from the SAME checkpoint and drain again.
    *
    * The complete-mode aggregation state lives in the checkpoint, so the
    * restarted query must pick up at exactly the next unread version: a
    * source that re-served already-consumed versions double-counts every
    * pre-stop row, one that skips ahead drops the between() rows, and one
    * that regressed its offsets corrupts the state — all hash-mismatch
    * against the full-table batch oracle. Data files are read in place
    * from the table dir; nothing is copied (the work dir holds only the
    * checkpoint and the sink output).
    */
  def replayTxLogIncremental(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      workPath: String,
      windowDur: String = "1 day",
      between: () => Unit = () => ()
  ): DataFrame = {
    val outPath = workPath + "_out"
    val ckpt = workPath + "_ckpt"
    Seq(outPath, ckpt).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    def aggOf(stream: DataFrame): DataFrame = stream
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value_cents")).cast("long").as("value_cents"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("window.end").cast("timestamp_ntz").as("window_end"),
        col("event_type"), col("cnt"), col("value_cents"))
    var outSchema: org.apache.spark.sql.types.StructType = null
    def runOnce(): Unit = {
      val agg = aggOf(streamTxLogTable(child, tablePath))
      outSchema = agg.schema
      val q = agg.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("overwrite").parquet(outPath)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    between()
    runOnce()
    readReplayOutput(spark, outPath, outSchema)
  }

  /** TABLE-TO-TABLE incremental streaming pipeline — the lakehouse loop
    * CLOSED: the incremental TxLog source ([[streamTxLogTable]]) reads
    * `srcTable`'s commits, `transform` reshapes each micro-batch, and the
    * exactly-once sink (`TxLog.appendIfNew` under `commitWithRetry`)
    * commits it into `dstTable` tagged `(appId, batchId)`. One call = one
    * streaming run (drain everything available, then stop); calling again
    * with the same `ckpt` RESUMES — source offsets and sink watermarks
    * both survive, so new upstream commits flow through exactly once and
    * a redelivered batch no-ops. This is the incremental medallion step
    * (bronze→silver as a stream) the reference schedules as nightly
    * batch jobs.
    *
    * Scale shape: per run, source work is O(new commits' files), sink
    * work O(transformed batch); nothing rescans either table's history.
    * `transform` must be row-level/stateless (each batch is transformed
    * independently; stateful transforms belong on the watermarked
    * replay paths).
    */
  def runTxLogPipelineOnce(
      spark: org.apache.spark.sql.SparkSession,
      srcTable: String,
      dstTable: String,
      ckpt: String,
      transform: DataFrame => DataFrame,
      appId: String = "graft-txlog-pipeline",
      maxVersionsPerTrigger: Long = 1L
  ): Unit = {
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val q = transform(streamTxLogTable(child, srcTable, maxVersionsPerTrigger))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val data = batch.persist()
        try {
          graft.gold.TxLog.commitWithRetry(dstTable)(v =>
            graft.gold.TxLog.appendIfNew(data.toDF(), dstTable, appId, bid, v))
          ()
        } finally { data.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** STREAM–STATIC enrichment join — the remaining join class: each
    * micro-batch of the incremental TxLog source joins a STATIC dimension
    * frame (no watermark, no state — the dim is a plain batch relation
    * Spark broadcasts per batch when small, the standard medallion enrich
    * step run incrementally). `dimOf` builds the dim on the CHILD session
    * the stream runs on (cross-session frames cannot mix); `join` composes
    * the batch-side plan. Returns the drained sink as a static frame.
    */
  def replayTxLogStaticEnrich(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      workPath: String,
      dimOf: org.apache.spark.sql.SparkSession => DataFrame,
      join: (DataFrame, DataFrame) => DataFrame,
      maxVersionsPerTrigger: Long = 1L
  ): DataFrame = {
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val joined = join(streamTxLogTable(child, tablePath, maxVersionsPerTrigger),
      dimOf(child))
    runReplayToParquet(spark, joined, workPath)
  }

  /** STREAMING CDF → keyed mirror: drive the `graft-txlog-cdf` source
    * ([[TxLogCdfSource]]) into an epoch-versioned mirror folded by natural
    * key — the streaming face of `TxLog.mergeByKeyFromChanges`. One call =
    * one run (drain, stop); calling again with the same `ckpt` resumes at
    * the next unread version, picking up commits (including
    * delete/replace rewrites and widening appends) made while down.
    * Exactly-once effect under foreachBatch's at-least-once redelivery
    * comes from the aggMaintainStream epoch discipline: batch N merges
    * onto the newest epoch STRICTLY BELOW N and (re)writes its own epoch,
    * so a redelivered batch re-derives identical state instead of
    * double-applying. Read the current state with [[readCdfMirror]].
    */
  def runTxLogCdfMirrorOnce(
      spark: org.apache.spark.sql.SparkSession,
      srcTable: String,
      mirrorPath: String,
      keys: Seq[String],
      ckpt: String,
      maxVersionsPerTrigger: Long = 1L
  ): Unit = {
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.format("graft-txlog-cdf")
      .option("path", srcTable)
      .option(TxLogSource.MaxVersionsKey, maxVersionsPerTrigger.toString)
      .load()
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        applyCdfBatch(batch.toDF(), bid, mirrorPath, keys)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One micro-batch of the CDF mirror fold — package-visible so replay
    * scenarios are directly testable. Applies the batch's versions in
    * ascending `_commit_version` order: the version's delete-row KEY SET
    * (batch-scale, broadcast) leaves via anti-join — the mirror is never
    * shuffled — then its insert rows union in (`allowMissingColumns`: a
    * widening append evolves the mirror schema, older rows NULL). The
    * per-version loop is driver-side but bounded by the source's
    * `maxVersionsPerTrigger`, never by history length.
    */
  private[graft] def applyCdfBatch(
      batch: DataFrame,
      batchId: Long,
      mirrorPath: String,
      keys: Seq[String]
  ): Unit = if (!batch.isEmpty) {
    import graft.streaming.TxLogCdfSource.{ChangeTypeCol, CommitVersionCol}
    val session = batch.sparkSession
    val b = batch.persist()
    try {
      val versions = b.select(col(CommitVersionCol)).distinct()
        .collect().map(_.getLong(0)).sorted
      val epochs = listEpochs(mirrorPath)
      val base = epochs.filter(_ < batchId).sorted.lastOption
      val dataCols = b.columns
        .filterNot(c => c == ChangeTypeCol || c == CommitVersionCol)
      var mirror = base match {
        case Some(k) => session.read.parquet(s"$mirrorPath/epoch=$k")
        case None    => b.filter(lit(false)).select(dataCols.map(col): _*)
      }
      versions.foreach { v =>
        val slice = b.filter(col(CommitVersionCol) === v)
        val delKeys = slice.filter(col(ChangeTypeCol) === "delete")
          .select(keys.map(col): _*).distinct()
        val ins = slice.filter(col(ChangeTypeCol) === "insert")
          .select(dataCols.map(col): _*)
        mirror = mirror.join(broadcast(delKeys), keys, "left_anti")
          .unionByName(ins, allowMissingColumns = true)
      }
      // the aggMaintainBatch publish discipline: tmp write (name invisible
      // to the epoch listing) + rename, replay overwrites its own epoch
      val tmp = new java.io.File(s"$mirrorPath/inprogress-$batchId")
      if (tmp.exists()) graft.core.Fs.rmTree(tmp)
      mirror.write.mode("overwrite").parquet(tmp.getPath)
      val dst = new java.io.File(s"$mirrorPath/epoch=$batchId")
      if (dst.exists()) graft.core.Fs.rmTree(dst)
      if (!tmp.renameTo(dst))
        throw new IllegalStateException(
          s"epoch publish failed: ${tmp.getPath} -> ${dst.getPath}")
      val newestN = (listEpochs(mirrorPath) :+ batchId).distinct
        .sorted.reverse.take(2).toSet
      epochs.filter(e => base.exists(e < _) && !newestN.contains(e)).foreach { e =>
        graft.core.Fs.rmTree(new java.io.File(s"$mirrorPath/epoch=$e"))
      }
    } finally { b.unpersist(); () }
  }

  /** Current (newest-epoch) state of a [[runTxLogCdfMirrorOnce]] mirror. */
  def readCdfMirror(spark: org.apache.spark.sql.SparkSession,
      mirrorPath: String): DataFrame = readAggStore(spark, mirrorPath)

  /** Stage a single sentinel row as the strictly-newest file under
    * `stagePath` (mod time now + 60 s, after [[writeTimeOrderedFiles]]'
    * backdated stamps) — the end-of-stream watermark push shared by the
    * append-mode replays.
    */
  private def appendSentinelFile(sentinel: DataFrame, stagePath: String): Unit = {
    val sentinelDir = java.nio.file.Files.createTempDirectory("graft_sentinel")
    try {
      sentinel.coalesce(1).write.mode("overwrite").parquet(sentinelDir.toString)
      val src = sentinelDir.toFile.listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dst = new java.io.File(stagePath, "zz-sentinel.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      require(dst.setLastModified(System.currentTimeMillis() + 60000L),
        s"could not stamp mod time on $dst")
    } finally graft.core.Fs.rmTree(sentinelDir.toFile)
  }

  /** Read a replay's parquet output with the KNOWN schema — an all-late /
    * empty replay must come back as an empty frame, not a schema-inference
    * failure.
    */
  private def readReplayOutput(s: org.apache.spark.sql.SparkSession,
      outPath: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (new java.io.File(outPath).exists()) s.read.schema(schema).parquet(outPath)
    else s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** Shuffle/state partition count for the file-replay harnesses — the
    * replays run a handful of micro-batches over sf-scale slices, where
    * per-task scheduling overhead dominates anything above single digits.
    * Measured at sf0.1 (isolated, min-of-reps): 8 → 4 cuts the outer
    * replay 9.3 → 7.0 s and the inner replay to 6.8 s (per-batch state
    * commits halve); 2 is within noise of 4, so 4 keeps a margin of state
    * parallelism. Each replay starts a fresh checkpoint, so the pinned
    * state partition count never conflicts across runs.
    */
  private val ReplayShufflePartitions = 4

  /** Batch-equivalence replay of the STREAM-STREAM interval join
    * ([[purchaseAttribution]]): stage `events` as time-ranged files,
    * stream them back one file per micro-batch, split the SAME source
    * into a click stream and a purchase stream, and interval-join them
    * with both sides watermarked. Returns the final joined table as a
    * static frame — gated as `q_o_stream_join_replay` against DuckDB's
    * batch interval join over the same events.
    *
    * Determinism argument (why the streamed result equals the batch
    * join EXACTLY): files are range-partitioned by ts, so once the
    * engine has read past a click's file, every purchase within the
    * 1-hour interval is in a file already read or the current one; with
    * a watermark delay (2 h) strictly greater than the join interval
    * (1 h), no click's state is evicted while a joinable purchase can
    * still arrive. Inner stream-stream joins emit matches eagerly, so
    * the final sink holds every batch-join row — a state eviction bug,
    * a dropped micro-batch, or wrong interval bounds all hash-mismatch.
    */
  def replayAttributionJoin(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      intervalHours: Int = 1,
      watermarkHours: Int = 2,
      arrivalCol: Option[String] = None
  ): DataFrame = {
    require(watermarkHours > intervalHours,
      "replayAttributionJoin: the determinism argument needs watermark " +
        s"delay > join interval (got $watermarkHours h <= $intervalHours h)")
    val s = events.sparkSession
    val stagedAll = stageEvents(events, arrivalCol)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    // Child session with few state partitions — see replayWindowedAgg.
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val joined = purchaseAttribution(
      clicks = stream.filter(col("event_type") === "click"),
      purchases = stream.filter(col("event_type") === "purchase"),
      watermark = s"$watermarkHours hours",
      intervalHours = intervalHours)
    runReplayToParquet(s, joined, stagePath)
  }

  /** LEFT OUTER stream-stream join replay — the subtlest streaming-join
    * semantics class: unmatched left rows are NOT emitted when seen (a
    * match may still arrive); they emit NULL-extended only once the
    * WATERMARK proves no match can come. Gated as
    * `q_o_stream_outer_replay` against DuckDB's batch LEFT JOIN: a
    * premature NULL emission (row appears both matched and NULL-extended),
    * a never-flushed pending click, or an eviction losing a matched flag
    * all hash-mismatch.
    *
    * The END-OF-STREAM flush is the part batch thinking gets wrong: after
    * the last real file, the watermark sits 2 h behind max(ts), so clicks
    * in the final window would hold their outer rows forever and the
    * replay would MISS them. A final sentinel file carries one far-future
    * click AND one far-future purchase (both user_id −1, matching
    * nothing) — BOTH sides must advance, because the global watermark is
    * the MIN across inputs — pushing the watermark past every real click;
    * Spark's no-data micro-batches then flush all pending outer rows. The
    * sentinel's own outer row is filtered from the returned frame.
    */
  def replayOuterJoin(
      events: DataFrame,
      stagePath: String,
      nFiles: Int = 6,
      intervalHours: Int = 1,
      watermarkHours: Int = 2,
      arrivalCol: Option[String] = None
  ): DataFrame = {
    require(watermarkHours > intervalHours,
      "replayOuterJoin: the determinism argument needs watermark " +
        s"delay > join interval (got $watermarkHours h <= $intervalHours h)")
    val s = events.sparkSession
    val stagedAll = stageEvents(events, arrivalCol)
    arrivalCol match {
      case Some(a) => writeArrivalOrderedFiles(stagedAll, stagePath, a)
      case None    => writeTimeOrderedFiles(stagedAll, stagePath, nFiles)
    }
    val staged = arrivalCol.map(stagedAll.drop(_)).getOrElse(stagedAll)
    // sentinel file: strictly newer mod time (appended AFTER the staged
    // files' stamps), far-future event time, one row per side. The
    // sentinel ids are Long.MinValue(+1) — a value no generated event_id
    // uses — so the cleanup filter below touches ONLY sentinel rows (a
    // predicate on a nullable data column like user_id would silently
    // drop real NULL-keyed outer rows the batch oracle keeps).
    // Empty input: nothing staged, no watermark to flush — skip the
    // sentinel (max(ts) is NULL) and let the sink read back empty.
    val maxTs = staged.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    if (maxTs != null) {
      // far enough that (farFuture − watermark) clears every real click's
      // flush bound (click_ts + interval), for ANY allowed (I, W) pair
      val farFuture = new java.sql.Timestamp(maxTs.getTime +
        (intervalHours + watermarkHours + 8L) * 3600 * 1000)
      import s.implicits._
      val sentinel = Seq(
        (SentinelId, farFuture, -1L, "click", 0.0),
        (SentinelId + 1, farFuture, -1L, "purchase", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      appendSentinelFile(sentinel, stagePath)
    }

    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val joined = clickOutcome(
      clicks = stream.filter(col("event_type") === "click"),
      purchases = stream.filter(col("event_type") === "purchase"),
      watermark = s"$watermarkHours hours",
      intervalHours = intervalHours)
    // click_id is never NULL on a left row, so this drops EXACTLY the
    // sentinel click's watermark-emitted outer row
    runReplayToParquet(s, joined, stagePath)
      .filter(col("click_id") =!= SentinelId)
  }

  /** Sentinel event id for replay end-of-stream flushes — outside any
    * generated event_id domain.
    */
  private val SentinelId = Long.MinValue

  /** NTZ→LTZ staging projection (watermarks demand TIMESTAMP; the
    * round-trip is the identity under any fixed session tz). `extra`
    * carries an arrival-order column through staging; it is dropped
    * before the stream reads the files back.
    */
  private def stageEvents(events: DataFrame,
      extra: Option[String] = None): DataFrame =
    events.select((Seq(col("event_id"),
      col("ts").cast("timestamp").as("ts"), col("user_id"),
      col("event_type"), col("value")) ++ extra.map(col)): _*)

  /** Write `staged` as `nFiles` time-ranged parquet files with STRICTLY
    * INCREASING mod times in event-time order. FileStreamSource replays
    * files in MODIFICATION-TIME order, and a parallel write stamps
    * near-identical mod times — observed: ties broke as 1,0,3,2,…, and a
    * whole file arriving behind the watermark is dropped as late (files 0
    * and 2 lost every match). The stamping makes the replay BE the
    * time-ordered arrival the determinism arguments assume.
    * NOTE: mod-time stamping is a LOCAL-FILESYSTEM harness device — it
    * no-ops on object stores; production replays should encode arrival
    * order in the source itself (e.g. Kafka offsets or per-batch paths).
    */
  private def writeTimeOrderedFiles(staged: DataFrame, stagePath: String,
      nFiles: Int): Unit = {
    graft.core.Fs.rmTree(new java.io.File(stagePath))
    staged.repartitionByRange(nFiles, col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(stagePath)
    val parts = new java.io.File(stagePath).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis() - parts.length * 60000L
    parts.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(base + i * 60000L),
        s"could not stamp mod time on $f - replay ordering would be " +
          "nondeterministic (watermark-late drops)")
    }
  }

  /** Write `staged` as one parquet file PER DISTINCT VALUE of integer
    * column `arrival` (ascending), stamped with strictly increasing mod
    * times in ARRIVAL order — the controlled OUT-OF-ORDER delivery
    * harness. Unlike [[writeTimeOrderedFiles]]' sorted split, a file here
    * may carry rows whose event times are EARLIER than rows in
    * previously-arrived files: late-but-in-watermark arrivals, the regime
    * real streams actually live in. The CALLER owns the lateness bound —
    * a row arriving after the watermark passed its event time is dropped
    * by the engine (diverging from batch BY CONTRACT); keep displacement
    * within (watermark − interval) slack for the replay ≡ batch
    * equivalence to hold (the StreamFuzzer's late generator does exactly
    * that). The arrival column is dropped from the written rows. Harness
    * device: one tiny sequential write per arrival group — fuzz/spec
    * scale, not a production path.
    */
  private def writeArrivalOrderedFiles(staged: DataFrame, stagePath: String,
      arrival: String): Unit = {
    graft.core.Fs.rmTree(new java.io.File(stagePath))
    new java.io.File(stagePath).mkdirs()
    val idxs = staged.select(col(arrival).cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted
    // leave headroom below now so an outer replay's sentinel (stamped
    // now + 60 s) stays strictly newest
    val base = System.currentTimeMillis() - (idxs.length + 2) * 60000L
    idxs.zipWithIndex.foreach { case (k, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_arrival")
      try {
        staged.filter(col(arrival) === k).drop(arrival)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val src = tmp.toFile.listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dst = new java.io.File(stagePath, f"arrival-$i%05d.parquet")
        java.nio.file.Files.move(src.toPath, dst.toPath)
        require(dst.setLastModified(base + i * 60000L),
          s"could not stamp mod time on $dst - replay ordering would be " +
            "nondeterministic")
      } finally graft.core.Fs.rmTree(tmp.toFile)
    }
  }

  /** Drive a replay query into an append-mode PARQUET sink and read it
    * back. The join output is MATCH-count scale (unbounded at 100×), so a
    * memory sink + collect() would be a driver bomb by construction; the
    * file sink appends each micro-batch distributed.
    */
  private def runReplayToParquet(s: org.apache.spark.sql.SparkSession,
      joined: DataFrame, stagePath: String): DataFrame = {
    val outPath = stagePath + "_out"
    val ckpt = stagePath + "_ckpt"
    Seq(outPath, ckpt).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    val q = joined.writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    readReplayOutput(s, outPath, joined.schema)
  }

  /** Stream-stream LEFT OUTER interval join: EVERY click emits exactly
    * once per qualifying purchase in the following hour, or once
    * NULL-extended if no purchase follows — the click-to-outcome funnel.
    * Outer rows are emitted by the engine only after the watermark passes
    * `click_ts + interval + delay` (see [[replayOuterJoin]]).
    */
  def clickOutcome(
      clicks: DataFrame,
      purchases: DataFrame,
      watermark: String = "10 minutes",
      intervalHours: Int = 1
  ): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $intervalHours HOUR"),
      "left_outer")
      .select("user_id", "click_id", "click_ts",
        "purchase_id", "purchase_ts", "value")
  }

  /** Streaming dedup on event_id — state bounded by the watermark. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user session aggregation with the built-in session_window —
    * no hand-rolled state for gap-based sessions.
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming Bronze ingest: watch a directory for contract CSVs and run
    * the SAME validation rule-chain as the batch bronze layer — the
    * incremental medallion entry the reference lists as future work. Each
    * micro-batch carries valid + rejected rows tagged with `reject_reason`;
    * route with `foreachBatch` (write valid/reject sinks per batch) in
    * production.
    */
  def bronzeCsvStream(
      spark: org.apache.spark.sql.SparkSession,
      watchDir: String,
      contract: graft.schema.Contracts.TableContract,
      runDate: String
  ): DataFrame = {
    val raw = spark.readStream
      .options(graft.bronze.BronzeIngest.CsvOptions) // parse identically to batch
      .schema(contract.raw)
      .csv(watchDir)
    val named = graft.bronze.BronzeIngest.rename(raw, contract)
    val typed = graft.bronze.BronzeIngest.coerceTypes(named, contract)
    val applicable = contract.rules.filter(_.refs.forall(typed.columns.contains))
    graft.bronze.Validation.tagged(typed, applicable)
      .withColumn("run_date", lit(runDate))
  }

  /** Streaming medallion sink: route each validated micro-batch to
    * valid/reject parquet paths with `foreachBatch`. Micro-batch writes are
    * append-mode; exactly-once comes from the checkpointed batch id — on
    * restart, a replayed batch id overwrites its own output subdirectory,
    * the standard idempotent-sink pattern.
    */
  def writeValidatedStream(
      tagged: DataFrame,
      validPath: String,
      rejectPath: String,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery =
    tagged.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.persist()
        try {
          b.filter(col("reject_reason").isNull).drop("reject_reason")
            .write.mode("overwrite").parquet(s"$validPath/batch_id=$batchId")
          b.filter(col("reject_reason").isNotNull)
            .write.mode("overwrite").parquet(s"$rejectPath/batch_id=$batchId")
        } finally { b.unpersist(); () }
      }
      .start()

  /** Streaming GOLD upsert: fold each micro-batch of dimension changes
    * into an SCD2 parquet dimension via `foreachBatch` +
    * `Scd2.incrementalMerge` — the incremental gold-layer path the batch
    * pipeline runs nightly, as a continuous stream.
    *
    * Exactly-once EFFECT without a transactional table format:
    * `incrementalMerge` is idempotent for a replayed batch — the re-merged
    * rows rebuild the same per-NK history (consecutive identical versions
    * collapse in change detection), so the restart-after-crash redelivery
    * of the last un-checkpointed batch converges to the identical dim
    * (spec-proven property). The physical swap is crash-safe without being
    * atomic: the new dim is written aside, the old dim renamed to a
    * `.bak`, the new one renamed in, the `.bak` deleted — and every batch
    * FIRST recovers a dangling `.bak` if a previous swap died between its
    * two renames. At no point is the only copy of the history deleted.
    * Production object stores would layer an ACID table format over this;
    * the merge semantics are the portable part.
    *
    * Scale: per batch, cost is proportional to the BATCH's touched keys
    * (left_semi-restricted rebuild), plus the rewrite of untouched rows —
    * at real dim sizes the rewrite is the motivation for partitioned dims
    * or an ACID format; the dataflow upstream of the sink is unchanged.
    */
  def scd2UpsertStream(
      changes: DataFrame,
      dimPath: String,
      checkpoint: String,
      nk: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tiebreak: Seq[String] = Nil
  ): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        scd2UpsertBatch(batch, batchId, dimPath, nk, orderCol, attrs, tiebreak)
      }
      .start()

  /** One micro-batch of the SCD2 upsert — package-visible so crash/replay
    * scenarios are directly testable. See `scd2UpsertStream`.
    */
  private[graft] def scd2UpsertBatch(
      batch: DataFrame,
      batchId: Long,
      dimPath: String,
      nk: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tiebreak: Seq[String] = Nil
  ): Unit = if (!batch.isEmpty) {
    val session = batch.sparkSession
    val dir = new java.io.File(dimPath)
    val bak = new java.io.File(dimPath + ".bak")
    // Recovery: a previous swap crashed between `dim → .bak` and
    // `tmp → dim` — the .bak IS the dim; restore it before merging.
    if (!dir.exists() && bak.exists() && !bak.renameTo(dir))
      throw new IllegalStateException(
        s"crash recovery failed: ${bak.getPath} -> $dimPath")
    val merged =
      if (dir.exists())
        graft.gold.Scd2.incrementalMerge(
          session.read.parquet(dimPath), batch, nk, orderCol, attrs, tiebreak)
      else graft.gold.Scd2.initialLoad(batch, nk, orderCol, attrs, tiebreak)
    val tmp = new java.io.File(dimPath + s".inprogress-$batchId")
    merged.write.mode("overwrite").parquet(tmp.getPath)
    // Swap, never holding zero copies of the history: clear any stale
    // .bak, step the current dim aside, move the new dim in, drop the old.
    if (bak.exists()) graft.core.Fs.rmTree(bak)
    if (dir.exists() && !dir.renameTo(bak))
      throw new IllegalStateException(
        s"swap step-aside failed: $dimPath -> ${bak.getPath}")
    if (!tmp.renameTo(dir))
      throw new IllegalStateException(
        s"swap failed: ${tmp.getPath} -> $dimPath (previous dim at ${bak.getPath})")
    if (bak.exists()) graft.core.Fs.rmTree(bak)
  }

  /** Streaming continuous-ingest dedup: per micro-batch, split incoming
    * documents into NOVEL (no near-dup in the historical signature store)
    * and DUPLICATE (near-dups something already accepted), then append the
    * novel docs' signatures to the store — so every batch dedups against
    * everything accepted before it. The streaming face of
    * `NearDup.dedupAgainstStore`; within-batch duplicates are deliberately
    * out of scope (run `minhashLshPairs` on the batch if needed).
    *
    * Idempotency: all three sinks (accept, duplicate, store-append) write
    * `batch_id=<id>` subdirectories in overwrite mode, and the store read
    * enumerates ONLY batch ids strictly below the current one — so a
    * replayed batch neither sees its own prior store contribution (which
    * would flip its split) nor double-counts anything; it re-derives the
    * identical split and overwrites its own output. Store enumeration is
    * explicit directory listing — a fresh pipeline is the empty list, and
    * any other read failure propagates loudly instead of being mistaken
    * for "no history".
    *
    * Scale: per batch, cost ∝ batch size + matched-bucket candidates (the
    * store is never re-shingled and not shuffled — see SCALING.md).
    */
  def dedupIngestStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      storePath: String,
      acceptPath: String,
      duplicatePath: String,
      checkpoint: String,
      minJaccard: Double = 0.65
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        dedupIngestBatch(batch, batchId, idCol, textCol,
          storePath, acceptPath, duplicatePath, minJaccard)
      }
      .start()

  /** One micro-batch of the ingest dedup — package-visible so replay
    * scenarios are directly testable. See `dedupIngestStream`.
    */
  private[graft] def dedupIngestBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      storePath: String,
      acceptPath: String,
      duplicatePath: String,
      minJaccard: Double = 0.65
  ): Unit = if (!batch.isEmpty) {
    val session = batch.sparkSession
    val b = batch.persist()
    try {
      // History = store partitions from STRICTLY EARLIER batches. A replay
      // must not join its own crashed-attempt contribution: batch-internal
      // near-dups are out of scope, and seeing them via the store would
      // flip the whole batch to "duplicate" and drop novel docs.
      val priorDirs = Option(new java.io.File(storePath).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .filter(_.getName.stripPrefix("batch_id=").toLong < batchId)
        .map(_.getPath)
      // dupIds is tiny (matched ids only) but expensive to produce (store
      // scan + band join + exact-Jaccard verify) — persist it so the three
      // downstream actions (accept write, duplicate write, store write)
      // don't each re-run the candidate join.
      val dupIds =
        (if (priorDirs.isEmpty) b.select(col(idCol)).limit(0)
         else {
           val store = session.read
             .option("basePath", storePath).parquet(priorDirs.toSeq: _*)
           graft.dedup.NearDup
             .dedupAgainstStore(store, b, idCol, textCol, minJaccard = minJaccard)
             .select(col("batch_id").as(idCol)).distinct()
         }).persist()
      try {
        val dup   = b.join(dupIds, Seq(idCol), "left_semi")
        val fresh = b.join(dupIds, Seq(idCol), "left_anti")
        fresh.write.mode("overwrite").parquet(s"$acceptPath/batch_id=$batchId")
        dup.write.mode("overwrite").parquet(s"$duplicatePath/batch_id=$batchId")
        if (!fresh.isEmpty)
          graft.dedup.NearDup.minhashSignatureStore(fresh, idCol, textCol)
            .write.mode("overwrite").parquet(s"$storePath/batch_id=$batchId")
      } finally { dupIds.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** Streaming incremental aggregate maintenance: fold each micro-batch's
    * partial aggregates into a stored additive aggregate table
    * (`operators.IncrementalAgg.mergeAdditive`) — the streaming face of the
    * batch gold-table merge. Per batch, cost ∝ batch + |groups|; the raw
    * history is never re-read.
    *
    * Exactly-once EFFECT despite foreachBatch's at-least-once replays: the
    * additive merge is NOT naturally idempotent (applying a batch twice
    * double-counts), so the store is EPOCH-VERSIONED — `epoch=<batchId>`
    * subdirectories, where epoch K holds the state after all batches ≤ K.
    * Batch N always merges onto the newest epoch STRICTLY BELOW N and
    * overwrites its own epoch, so a replayed batch re-derives the identical
    * state instead of double-applying itself. Epochs older than the merge
    * base are pruned after a successful write, but the newest
    * `retainEpochs` always survive — on shared/object storage set it above
    * the default 2 so a long-running reader holding an older epoch open
    * doesn't race the prune.
    *
    * @param build        maps a raw micro-batch to its partial aggregate
    *                     (groupBy `keys` + the additive measure columns)
    * @param retainEpochs how many newest epochs to keep (>= 2; the
    *                     newest-below-batch epoch is the replay merge base)
    */
  def aggMaintainStream(
      events: DataFrame,
      aggPath: String,
      checkpoint: String,
      keys: Seq[String],
      build: DataFrame => DataFrame,
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      retainEpochs: Int = 2
  ): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        aggMaintainBatch(batch, batchId, aggPath, keys, build, sums, mins, maxs,
          retainEpochs)
      }
      .start()

  /** One micro-batch of the aggregate maintenance — package-visible so
    * replay scenarios are directly testable. See `aggMaintainStream`.
    */
  private[graft] def aggMaintainBatch(
      batch: DataFrame,
      batchId: Long,
      aggPath: String,
      keys: Seq[String],
      build: DataFrame => DataFrame,
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      retainEpochs: Int = 2
  ): Unit = if (!batch.isEmpty) {
    require(retainEpochs >= 2,
      "aggMaintainBatch: retainEpochs must be >= 2 — the newest-below-batch " +
        "epoch is the merge base a replay of this batch recovers from")
    val session = batch.sparkSession
    val epochs  = listEpochs(aggPath)
    val base    = epochs.filter(_ < batchId).sorted.lastOption
    val partial = build(batch)
    val merged = base match {
      case Some(k) =>
        graft.operators.IncrementalAgg.mergeAdditive(
          session.read.parquet(s"$aggPath/epoch=$k"), partial,
          keys, sums, mins, maxs)
      case None => partial
    }
    // publish atomically: write to a tmp dir (its name does NOT match the
    // epoch= listing filter) and rename into place, so a crash mid-write
    // can never leave a half-written epoch that readAggStore would serve
    // as newest state. Same discipline as scd2UpsertBatch's swap.
    val tmp = new java.io.File(s"$aggPath/inprogress-$batchId")
    if (tmp.exists()) graft.core.Fs.rmTree(tmp)
    merged.write.mode("overwrite").parquet(tmp.getPath)
    val dst = new java.io.File(s"$aggPath/epoch=$batchId")
    if (dst.exists()) graft.core.Fs.rmTree(dst) // replay overwrites itself
    if (!tmp.renameTo(dst))
      throw new IllegalStateException(
        s"epoch publish failed: ${tmp.getPath} -> ${dst.getPath}")
    // prune epochs that are BOTH strictly below the merge base (so a replay
    // of this batch — or of any later batch still on disk — keeps its
    // recovery point) AND outside the newest `retainEpochs` (so slow readers
    // on shared storage get a grace window: a reader pinned to epoch K
    // survives until K falls out of the newest N, instead of racing the very
    // next prune). retainEpochs = 2 reproduces the old minimal footprint.
    val newestN = (listEpochs(aggPath) :+ batchId).distinct
      .sorted.reverse.take(retainEpochs).toSet
    epochs.filter(e => base.exists(e < _) && !newestN.contains(e)).foreach { e =>
      graft.core.Fs.rmTree(new java.io.File(s"$aggPath/epoch=$e"))
    }
  }

  /** Epoch directories of an `aggMaintainStream` store — shared by the
    * writer (merge base + pruning) and reader so the two can't drift.
    */
  private def listEpochs(aggPath: String): Array[Long] =
    Option(new java.io.File(aggPath).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
      .map(f => f.getName.stripPrefix("epoch=").toLong)

  /** Read the current (newest-epoch) state of an `aggMaintainStream` store. */
  def readAggStore(session: org.apache.spark.sql.SparkSession, aggPath: String): DataFrame = {
    val epochs = listEpochs(aggPath)
    require(epochs.nonEmpty, s"no epochs under $aggPath")
    session.read.parquet(s"$aggPath/epoch=${epochs.max}")
  }

  /** Stream–stream interval join: pair each purchase with EVERY click by
    * the same user within the preceding hour (one output row per qualifying
    * click — interval-join semantics, so summing `value` over the output
    * multi-counts it; last-click attribution needs a downstream
    * max-by-click_ts aggregation). Both sides are watermarked so the join
    * state is bounded — Spark drops buffered rows once the watermark passes
    * the interval bound.
    */
  def purchaseAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      watermark: String = "10 minutes",
      intervalHours: Int = 1
  ): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $intervalHours HOUR"),
      "inner")
      .select("user_id", "purchase_id", "purchase_ts", "value", "click_id", "click_ts")
  }

  final case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  /** Custom streaming state: running per-user totals via mapGroupsWithState
    * (the KeyValueGroupedDataset path for semantics session_window can't
    * express). Update-mode output: one refreshed row per user per batch.
    */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0))
          val evs  = batch.toSeq
          val next = UserStats(user, prev.n_events + evs.size,
            prev.total_value + evs.map(_.value).sum)
          state.update(next)
          next
      }
  }
}
