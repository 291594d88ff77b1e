package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Property fuzzer for the STREAMING REPLAY ≡ BATCH equivalence — the
  * contract the replay gates pin for one fixed scenario each
  * (`q_o_stream_window_replay` / `_append_replay` / `_join_replay` /
  * `_late_replay` / `_outer_replay` / `_dedup_replay` /
  * `_session_replay`), here driven over randomized scenarios across SIX
  * modes (complete-mode windowed agg, APPEND-mode finalize-once windowed
  * agg, inner interval join, left-outer join, stateful dedup with salted
  * same-key copies, session windows with exact-gap boundary salt):
  * random event/click/purchase streams
  * (NULL user keys, boundary-exact interval hits, duplicate timestamps),
  * random file splits (1–8 micro-batches), random join intervals and
  * watermark lateness, random window widths. Each seed replays one mode
  * through the REAL streaming harness (`EventStream.replay*` — file
  * source, watermarks, state store, sentinel flush) and diffs the final
  * table against a DuckDB batch twin computed over the SAME events in
  * pure epoch-seconds integer arithmetic (no timestamp-zone surface at
  * all — the replay output is normalized to epoch seconds + exact cents
  * before compare).
  *
  * Preconditions the generator honors (they are the determinism contract,
  * not fuzz blind spots — violating them is DOCUMENTED divergence):
  * watermark delay strictly greater than the join interval, and every row
  * arrives BEFORE the watermark passes its event time. Within that
  * contract, roughly half the seeds deliver rows OUT OF ORDER across
  * files — late-but-in-watermark arrivals, displaced to later files with
  * the displacement bounded by (watermark − interval) slack against the
  * in-order split's prefix maxima (a conservative bound: moves only push
  * rows later, so realized prefix maxima can only shrink). Real streams
  * live in exactly this regime; strictly event-time-ordered files are the
  * other half of the seeds.
  */
object StreamFuzzer {

  private def scramble(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** One generated scenario: the events (both framings), the replay
    * config, and the DuckDB twin SQL over view `ev(event_id, ts_s,
    * user_id, event_type, cents)`.
    */
  final case class Scenario(
      seed: Long,
      mode: String, // windowed|append|inner|outer|dedup|session
      nFiles: Int,
      intervalHours: Int,
      watermarkHours: Int,
      windowSec: Long, // tumbling width (windowed/append) or session GAP (session)
      rows: Seq[(Long, Long, java.lang.Long, String, Long)], // id, ts_s, user, type, cents
      sql: String,
      fileOf: Option[Seq[Int]] = None, // per-row arrival file (None = in-order split)
      nLate: Int = 0) { // rows displaced to a later file than their in-order one
    def desc: String = s"$mode/files=$nFiles/I=$intervalHours/W=$watermarkHours/" +
      s"win=${windowSec}s/n=${rows.size}" +
      fileOf.map(_ => s"/late=$nLate").getOrElse("")
  }

  def generate(seed: Long): Scenario = {
    val rnd = new java.util.Random(scramble(seed))
    val mode = Seq("windowed", "inner", "outer", "append",
      "dedup", "session")(rnd.nextInt(6))
    val nFiles = 1 + rnd.nextInt(8)
    val intervalHours = 1 + rnd.nextInt(2)          // 1..2
    val watermarkHours = intervalHours + 1 + rnd.nextInt(3) // I+1 .. I+3
    val windowSec = Seq(3600L, 6 * 3600L, 24 * 3600L)(rnd.nextInt(3))
    val nUsers = 1 + rnd.nextInt(8)
    val n = 20 + rnd.nextInt(180)
    val base = 1700000000L
    val spanSec = (6 + rnd.nextInt(72)) * 3600

    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, java.lang.Long, String, Long)]
    var id = 0L
    def nextId(): Long = { id += 1; id }
    (0 until n).foreach { _ =>
      val user: java.lang.Long =
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(1L + rnd.nextInt(nUsers))
      // occasional NULL event_type: joins must drop it on BOTH engines
      // (WHERE type='click' is null-false), windowed/append must KEEP the
      // null GROUP (the sentinel cleanup filter must not eat it)
      val typ = if (rnd.nextInt(12) == 0) null
        else Seq("click", "purchase", "view")(rnd.nextInt(3))
      val ts = base + rnd.nextInt(spanSec)
      buf += ((nextId(), ts, user, typ, rnd.nextInt(100000).toLong))
    }
    // boundary injections: for a few clicks, add purchases exactly AT the
    // inclusive interval bound and one second PAST it (must not match),
    // plus a same-timestamp purchase (inclusive lower bound)
    val clicks = buf.filter(_._4 == "click").take(3).toVector
    clicks.foreach { case (_, ts, user, _, _) =>
      if (user != null) {
        buf += ((nextId(), ts + intervalHours * 3600L, user, "purchase", rnd.nextInt(100000).toLong))
        buf += ((nextId(), ts + intervalHours * 3600L + 1, user, "purchase", rnd.nextInt(100000).toLong))
        buf += ((nextId(), ts, user, "purchase", rnd.nextInt(100000).toLong))
      }
    }
    // dedup salt: ~15% of rows re-arrive as payload copies under the SAME
    // event_id, displaced 1 .. (watermark − 1 s) later — inside
    // dropDuplicatesWithinWatermark's dedup guarantee relative to the
    // first occurrence. Copies share user/type/cents so the twin's
    // DISTINCT is survivor-order-independent (which physical copy
    // survives within one micro-batch is engine-unspecified).
    if (mode == "dedup") {
      val salt = buf.toVector.filter(_ => rnd.nextInt(7) < 1)
      salt.foreach { case (eid, ts, user, typ, cents) =>
        val lag = 1 + rnd.nextInt(watermarkHours * 3600 - 2)
        buf += ((eid, ts + lag, user, typ, cents))
      }
    }
    // session boundary salt: rows at EXACTLY gap distance (MERGE —
    // session_window extends on adjacency, spec-pinned) and at gap + 1 s
    // (new session), on the same user
    if (mode == "session") {
      buf.toVector.filter(r => r._3 != null).take(3)
        .foreach { case (_, ts, user, _, _) =>
          buf += ((nextId(), ts + windowSec, user, "view", rnd.nextInt(100000).toLong))
          buf += ((nextId(), ts + windowSec + 1, user, "view", rnd.nextInt(100000).toLong))
        }
    }

    val sql = mode match {
      case "windowed" | "append" =>
        s"""SELECT ts_s - ts_s % $windowSec AS wstart_s, event_type,
           |  COUNT(*) AS cnt, SUM(cents) AS value_cents
           |FROM ev GROUP BY 1, 2""".stripMargin
      case "inner" =>
        s"""SELECT p.user_id, p.event_id AS purchase_id, p.ts_s AS purchase_ts_s,
           |  p.cents AS cents, c.event_id AS click_id, c.ts_s AS click_ts_s
           |FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
           |JOIN (SELECT * FROM ev WHERE event_type = 'click') c
           |  ON c.user_id = p.user_id
           | AND c.ts_s <= p.ts_s AND c.ts_s >= p.ts_s - ${intervalHours * 3600L}""".stripMargin
      case "outer" =>
        s"""SELECT c.user_id, c.event_id AS click_id, c.ts_s AS click_ts_s,
           |  p.event_id AS purchase_id, p.ts_s AS purchase_ts_s, p.cents AS cents
           |FROM (SELECT * FROM ev WHERE event_type = 'click') c
           |LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
           |  ON p.user_id = c.user_id
           | AND p.ts_s >= c.ts_s AND p.ts_s <= c.ts_s + ${intervalHours * 3600L}""".stripMargin
      case "dedup" =>
        // salted copies share the full payload, so DISTINCT is exactly
        // one row per event_id regardless of which copy survived
        "SELECT DISTINCT event_id, user_id, event_type, cents FROM ev"
      case "session" =>
        // gap-islands twin; break on > (session_window merges on
        // overlap-or-adjacency — exactly-gap EXTENDS, spec-pinned).
        // sid assignment is tie-permutation-invariant: equal ts_s rows
        // have diff 0, the event_id tiebreak just makes the plan total
        s"""WITH m AS (
           |  SELECT user_id, ts_s, event_id, cents,
           |    CASE WHEN lag(ts_s) OVER w IS NULL
           |          OR ts_s - lag(ts_s) OVER w > $windowSec
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
           |g AS (SELECT user_id, ts_s, cents,
           |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
           |          ROWS UNBOUNDED PRECEDING) AS sid
           |      FROM m)
           |SELECT user_id, MIN(ts_s) AS sstart_s, MAX(ts_s) + $windowSec AS send_s,
           |  COUNT(*) AS n_events, SUM(cents) AS value_cents
           |FROM g GROUP BY user_id, sid""".stripMargin
    }
    // Late-but-in-watermark arrivals (half the seeds, when multi-file):
    // displace ~25% of rows to a LATER file, bounded so no row is ever
    // behind the watermark when its file arrives. The bound uses the
    // in-order split's prefix maxima, which is conservative — moves only
    // push rows later, so the realized prefix maxima can only shrink.
    val withLate = rnd.nextBoolean() && nFiles > 1 && buf.size >= nFiles
    val (fileOf, nLate) =
      if (!withLate) (None, 0)
      else {
        val n2 = buf.size
        val order = buf.indices.sortBy(i => (buf(i)._2, buf(i)._1))
        val assign = Array.ofDim[Int](n2)
        order.zipWithIndex.foreach { case (bi, rank) =>
          assign(bi) = rank * nFiles / n2
        }
        // max event ts among files strictly before f, under the in-order split
        val fileMax = Array.fill(nFiles)(Long.MinValue)
        buf.indices.foreach(i =>
          fileMax(assign(i)) = math.max(fileMax(assign(i)), buf(i)._2))
        val prefMax = Array.ofDim[Long](nFiles)
        prefMax(0) = Long.MinValue
        (1 until nFiles).foreach(f =>
          prefMax(f) = math.max(prefMax(f - 1), fileMax(f - 1)))
        // strict slack: (watermark − interval) minus 1 s keeps every
        // displaced row strictly above the watermark at arrival
        val slackSec = (watermarkHours - intervalHours).toLong * 3600 - 1
        var late = 0
        buf.indices.foreach { i =>
          if (rnd.nextInt(4) == 0) {
            val cur = assign(i)
            val target = math.min(nFiles - 1, cur + 1 + rnd.nextInt(3))
            if (target > cur && prefMax(target) - buf(i)._2 <= slackSec) {
              assign(i) = target
              late += 1
            }
          }
        }
        (Some(assign.toSeq), late)
      }
    Scenario(seed, mode, nFiles, intervalHours, watermarkHours, windowSec,
      buf.toSeq, sql, fileOf, nLate)
  }

  /** Events framed for the streaming harness: LTZ ts (UTC session), money
    * as the double the staging layer expects (exact cents / 100). When the
    * scenario carries a late-arrival assignment, rows additionally carry
    * their arrival-file index as `__file` for the harness's
    * arrival-ordered staging.
    */
  private def eventsFrame(spark: SparkSession, sc: Scenario): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema0 = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long", false).add("ts_s", "long", false)
      .add("user_id", "long", true).add("event_type", "string", true)
      .add("cents", "long", false)
    val schema = sc.fileOf match {
      case Some(_) => schema0.add("__file", "integer", false)
      case None    => schema0
    }
    val rows = sc.fileOf match {
      case Some(assign) => sc.rows.zip(assign).map { case ((i, t, u, ty, c), f) =>
        org.apache.spark.sql.Row(i, t, u, ty, c, f)
      }
      case None => sc.rows.map { case (i, t, u, ty, c) =>
        org.apache.spark.sql.Row(i, t, u, ty, c)
      }
    }
    spark.createDataFrame(rows.asJava, schema)
      .select((Seq(col("event_id"), timestamp_seconds(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"),
        (col("cents").cast("double") / 100.0).as("value")) ++
        sc.fileOf.map(_ => col("__file"))): _*)
  }

  /** Run one scenario: real streaming replay → epoch/cents normalization →
    * exact diff against the DuckDB twin over the same rows.
    */
  def run(spark: SparkSession, con: java.sql.Connection,
      tmpRoot: String, seed: Long): DiffRunner.Outcome = {
    val sc = generate(seed)
    val dir = new java.io.File(tmpRoot, s"seed_$seed")
    val stage = new java.io.File(dir, "stage").getPath
    try {
      val ev = eventsFrame(spark, sc)
      val arrival = sc.fileOf.map(_ => "__file")
      val replayed = sc.mode match {
        case "windowed" =>
          EventStream.replayWindowedAgg(ev, stage, sc.nFiles,
            windowDur = s"${sc.windowSec} seconds", arrivalCol = arrival)
            .select(
              unix_timestamp(col("window_start").cast("timestamp")).as("wstart_s"),
              col("event_type"), col("cnt"), col("value_cents"))
        case "append" =>
          // finalize-once append mode: watermarked windows, sentinel
          // flush; the SAME batch twin as complete mode must come back
          EventStream.replayWindowedAggAppend(ev, stage, sc.nFiles,
            windowDur = s"${sc.windowSec} seconds",
            watermarkHours = sc.watermarkHours, arrivalCol = arrival)
            .select(
              unix_timestamp(col("window_start").cast("timestamp")).as("wstart_s"),
              col("event_type"), col("cnt"), col("value_cents"))
        case "inner" =>
          EventStream.replayAttributionJoin(ev, stage, sc.nFiles,
            sc.intervalHours, sc.watermarkHours, arrivalCol = arrival)
            .select(col("user_id"), col("purchase_id"),
              unix_timestamp(col("purchase_ts")).as("purchase_ts_s"),
              round(col("value") * 100).cast("long").as("cents"),
              col("click_id"),
              unix_timestamp(col("click_ts")).as("click_ts_s"))
        case "outer" =>
          EventStream.replayOuterJoin(ev, stage, sc.nFiles,
            sc.intervalHours, sc.watermarkHours, arrivalCol = arrival)
            .select(col("user_id"), col("click_id"),
              unix_timestamp(col("click_ts")).as("click_ts_s"),
              col("purchase_id"),
              unix_timestamp(col("purchase_ts")).as("purchase_ts_s"),
              round(col("value") * 100).cast("long").as("cents"))
        case "dedup" =>
          EventStream.replayDedupStream(ev, stage, sc.nFiles,
            watermarkHours = sc.watermarkHours, arrivalCol = arrival)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("value_cents"))
        case "session" =>
          // IMPLEMENTATION LOTTERY: odd scrambles run the
          // flatMapGroupsWithState custom-state fold — both session
          // implementations fuzz against the same twin, INCLUDING the
          // late-arrival seeds (the fragment-merge state lifted the
          // round-11 in-order-only contract)
          val base =
            if ((scramble(sc.seed) & 1L) == 1L)
              EventStream.replayCustomSession(ev, stage, sc.nFiles,
                gapSec = sc.windowSec, watermarkHours = sc.watermarkHours,
                arrivalCol = arrival)
            else
              EventStream.replaySessionWindow(ev, stage, sc.nFiles,
                gap = s"${sc.windowSec} seconds",
                gapHoursForSentinel = ((sc.windowSec + 3599) / 3600).toInt,
                watermarkHours = sc.watermarkHours, arrivalCol = arrival)
          base.select(col("user_id"),
            unix_timestamp(col("session_start").cast("timestamp")).as("sstart_s"),
            unix_timestamp(col("session_end").cast("timestamp")).as("send_s"),
            col("n_events"), col("value_cents"))
      }
      val sparkRows = replayed.collect()
        .map(r => (0 until r.length).map(i => DiffRunner.fmt(r.get(i))).toSeq).toSeq

      // oracle: load the SAME rows into a DuckDB temp table, run the twin
      val st = con.createStatement()
      val oracleRows =
        try {
          st.execute("DROP TABLE IF EXISTS ev")
          st.execute("CREATE TABLE ev (event_id BIGINT, ts_s BIGINT, " +
            "user_id BIGINT, event_type VARCHAR, cents BIGINT)")
          val ins = con.prepareStatement("INSERT INTO ev VALUES (?, ?, ?, ?, ?)")
          try {
            sc.rows.foreach { case (i, t, u, ty, c) =>
              ins.setLong(1, i); ins.setLong(2, t)
              if (u == null) ins.setNull(3, java.sql.Types.BIGINT)
              else ins.setLong(3, u.longValue())
              ins.setString(4, ty); ins.setLong(5, c)
              ins.addBatch()
            }
            ins.executeBatch()
          } finally ins.close()
          val rs = st.executeQuery(sc.sql)
          val ncol = rs.getMetaData.getColumnCount
          val b = scala.collection.mutable.ArrayBuffer[Seq[String]]()
          while (rs.next()) b += (1 to ncol).map(i => DiffRunner.fmt(rs.getObject(i)))
          b.toSeq
        } finally st.close()

      val a = sparkRows.sortBy(_.mkString("|"))
      val b = oracleRows.sortBy(_.mkString("|"))
      if (a == b) DiffRunner.Outcome(seed, sc.desc, ok = true, a.size, b.size, None)
      else {
        val firstDiff = a.zipAll(b, Seq("<missing>"), Seq("<missing>"))
          .find { case (x, y) => x != y }
          .map { case (x, y) => s"spark=${x.mkString("|")} oracle=${y.mkString("|")}" }
          .getOrElse(s"row counts ${a.size} vs ${b.size}")
        DiffRunner.Outcome(seed, sc.desc, ok = false, a.size, b.size, Some(firstDiff))
      }
    } catch {
      case e: Throwable =>
        DiffRunner.Outcome(seed, sc.desc, ok = false, -1, -1,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    } finally graft.core.Fs.rmTree(dir)
  }
}
