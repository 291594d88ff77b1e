package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._

/** Round-13 protocol growth: DV-based UPDATE/MERGE (row-level mutation
  * without file rewrites), commit timestamps + TIMESTAMP AS OF (with the
  * Delta monotonicity clamp and both refusal directions), log-recorded
  * add-file sizes (byte walks are pure log metadata; FS-stat fallback
  * only for legacy records), and vacuum's dryRun + streaming-lag guard.
  */
class TxLogMutationSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("txmut").toString + "/t"

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i", (i % 5).toLong)).toDF("id", "payload", "cents")

  private def byId(df: org.apache.spark.sql.DataFrame): Array[(Long, String, Long)] =
    df.select("id", "payload", "cents").as[(Long, String, Long)]
      .collect().sortBy(_._1)

  private def partFiles(path: String): Set[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getName).toSet

  test("updateWhereDV == classic delete+append twin on visible rows; zero removed files; CDF folds it") {
    val a = freshPath(); val b = freshPath()
    TxLog.init(rows(0 until 300).repartitionByRange(6, col("id")), a)
    TxLog.init(rows(0 until 300).repartitionByRange(6, col("id")), b)
    val before = partFiles(a)
    val beforeSnap = TxLog.snapshot(a)
    // DV path: one atomic commit
    TxLog.updateWhereDV(spark, a, col("id") % 7 === 3,
      Map("cents" -> (col("cents") + 100L), "payload" -> lit("upd")), 0L)
    // classic twin: replaceWhereKeys with the matched keys and updated images
    val matched = TxLog.read(spark, b).filter(col("id") % 7 === 3)
    val updated = matched.withColumn("cents", col("cents") + 100L)
      .withColumn("payload", lit("upd"))
    TxLog.replaceWhereKeys(spark, b, matched.select("id"), Seq("id"), updated, 0L)
    byId(TxLog.read(spark, a)) shouldBe byId(TxLog.read(spark, b))
    // soft mechanics: no file removed, untouched files not rewritten
    val after = TxLog.snapshot(a)
    before.subsetOf(partFiles(a)) shouldBe true
    beforeSnap.files.toSet.subsetOf(after.files.toSet) shouldBe true
    after.dvs should not be empty
    // the change feed reconstructs the mutated table exactly (delete of
    // old images + insert of new images, one version)
    byId(TxLog.mirrorFromChanges(spark, a)) shouldBe byId(TxLog.read(spark, a))
    // NULL predicate updates nothing (SQL UPDATE semantics)
    val c = freshPath()
    Seq((1L, java.lang.Long.valueOf(10L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "x").write.parquet(c.stripSuffix("/t") + "/stage")
    TxLog.init(spark.read.parquet(c.stripSuffix("/t") + "/stage"), c)
    TxLog.updateWhereDV(spark, c, col("x") > 5L, Map("x" -> lit(0L)), 0L)
    TxLog.read(spark, c).filter(col("id") === 2L).select("x")
      .head().isNullAt(0) shouldBe true
    TxLog.read(spark, c).filter(col("id") === 1L).select("x")
      .head().getLong(0) shouldBe 0L
  }

  test("updateWhereDV: updated rows are gated by CHECK constraints (atomic refusal)") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartitionByRange(2, col("id")), path)
    TxLog.addConstraint(spark, path, "cents_nonneg", "cents >= 0", 0L)
    val e = intercept[TxLog.ConstraintViolationException] {
      TxLog.updateWhereDV(spark, path, col("id") < 10L,
        Map("cents" -> lit(-1L)), 1L)
    }
    e.name shouldBe "cents_nonneg"
    TxLog.currentVersion(path) shouldBe Some(1L) // nothing published
    byId(TxLog.read(spark, path)) shouldBe byId(TxLog.read(spark, path, Some(1L)))
  }

  test("replaceWhereKeysDV == replaceWhereKeys on visible rows at every version; mergeByKey folds both") {
    val a = freshPath(); val b = freshPath()
    val init = rows(0 until 240).repartitionByRange(4, col("id"))
    TxLog.init(init, a); TxLog.init(init, b)
    val keys = rows(0 until 240).filter(col("id") % 6 === 1).select("id")
    val newData = rows(1000 until 1040)
      .unionAll(rows(0 until 240).filter(col("id") % 12 === 1)
        .withColumn("payload", lit("replaced")))
    TxLog.replaceWhereKeysDV(spark, a, keys, Seq("id"), newData, 0L)
    TxLog.replaceWhereKeys(spark, b, keys, Seq("id"), newData, 0L)
    byId(TxLog.read(spark, a)) shouldBe byId(TxLog.read(spark, b))
    // physical: DV path removed no files
    TxLog.snapshot(a, Some(0L)).files.toSet
      .subsetOf(TxLog.snapshot(a).files.toSet) shouldBe true
    // keyed CDF consumer folds the DV-merge version as an update
    byId(TxLog.mergeByKeyFromChanges(spark, a, Seq("id"))) shouldBe
      byId(TxLog.read(spark, a))
    // a second DV merge composes with the existing vectors
    val keys2 = rows(0 until 240).filter(col("id") % 6 === 5).select("id")
    TxLog.replaceWhereKeysDV(spark, a, keys2, Seq("id"),
      newData = rows(2000 until 2010), 1L)
    TxLog.replaceWhereKeys(spark, b, keys2, Seq("id"),
      newData = rows(2000 until 2010), 1L)
    byId(TxLog.read(spark, a)) shouldBe byId(TxLog.read(spark, b))
    // purge materializes: same visible rows, vectors gone
    TxLog.purgeDeletes(spark, a, 2L)
    byId(TxLog.read(spark, a)) shouldBe byId(TxLog.read(spark, b))
    TxLog.snapshot(a).dvs shouldBe empty
  }

  test("commit timestamps: raw in history, clamped for resolution; both refusal directions") {
    val path = freshPath()
    // non-monotone injected clock: v1 stamps BELOW v0 (skewed writer)
    val stamps = Iterator(100000L, 50000L, 200000L)
    TxLog.usingClock(() => stamps.next()) {
      TxLog.init(rows(0 until 10), path)             // v0 @ 100000
      TxLog.append(rows(10 until 20), path, 0L)      // v1 @ 50000 (skew!)
      TxLog.append(rows(20 until 30), path, 1L)      // v2 @ 200000
    }
    // raw stamps in the audit trail (newest first)
    val h = TxLog.history(spark, path)
    h.columns.head shouldBe "timestamp"
    val rawMs = TxLog.commitInfos(path).map(_.timestampMillis.get)
    rawMs shouldBe Seq(200000L, 50000L, 100000L)
    // clamped resolution: v1 resolves at 100001
    TxLog.clampedCommitTimestamps(path) shouldBe
      Seq((0L, 100000L), (1L, 100001L), (2L, 200000L))
    TxLog.versionAtTimestamp(path, 100000L) shouldBe 0L
    TxLog.versionAtTimestamp(path, 100001L) shouldBe 1L
    TxLog.versionAtTimestamp(path, 199999L) shouldBe 1L
    TxLog.versionAtTimestamp(path, 200000L) shouldBe 2L
    TxLog.readTimestampAsOf(spark, path, 150000L).count() shouldBe 20L
    // refusals: before earliest retained, after latest
    intercept[IllegalArgumentException] {
      TxLog.versionAtTimestamp(path, 99999L)
    }.getMessage should include("before the earliest")
    intercept[IllegalArgumentException] {
      TxLog.versionAtTimestamp(path, 200001L)
    }.getMessage should include("after the latest")
    // vacuum moves the floor: below-horizon timestamps refuse like versions
    TxLog.usingClock(() => 300000L) {
      TxLog.append(rows(30 until 40), path, 2L)
    }
    TxLog.vacuum(path, retainVersions = 2, minAgeMs = 0L)
    intercept[IllegalArgumentException] {
      TxLog.versionAtTimestamp(path, 150000L)
    }.getMessage should include("before the earliest")
    TxLog.versionAtTimestamp(path, 250000L) shouldBe 2L
  }

  test("timestamp travel refuses on a partially stamped (legacy) history") {
    val path = freshPath()
    TxLog.init(rows(0 until 10), path)
    // manufacture a legacy record: strip the tsMillis field from v0
    val vf = new java.io.File(path, "_graft_txlog/00000000000000000000.json")
    val text = new String(java.nio.file.Files.readAllBytes(vf.toPath), "UTF-8")
    java.nio.file.Files.write(vf.toPath,
      text.replaceFirst("\"tsMillis\":-?\\d+,", "").getBytes("UTF-8"))
    TxLog.append(rows(10 until 20), path, 0L)
    intercept[IllegalStateException] {
      TxLog.versionAtTimestamp(path, System.currentTimeMillis())
    }.getMessage should include("no commit timestamp")
    // version-based travel still serves it
    TxLog.read(spark, path, asOf = Some(0L)).count() shouldBe 10L
  }

  test("byte walks are pure log metadata on fresh tables; legacy stat-less records fall back to ONE FS stat per file") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartitionByRange(3, col("id")), path)
    TxLog.append(rows(100 until 150), path, 0L)
    TxLog.deleteWhere(spark, path, col("id") < 10L, 1L)
    val conf = spark.sparkContext.hadoopConfiguration
    TxLog.sizeFallbackStats.set(0L)
    val add0 = TxLog.versionAddBytes(path, 0L, conf)
    val chg2 = TxLog.versionChangeBytes(path, 2L, conf)
    TxLog.sizeFallbackStats.get() shouldBe 0L // zero filesystem stats
    // the recorded sizes are the real ones
    val snap0 = TxLog.snapshot(path, Some(0L))
    add0 shouldBe snap0.files
      .map(f => new java.io.File(path, f).length()).sum
    chg2 should be > 0L
    // a table whose schema has NO stats-eligible columns commits
    // stat-less records: the byte walk falls back (correct, counted)
    val p2 = freshPath()
    val noStats = (0 until 50).map(i => Array(i.toDouble, 1.0))
      .toDF("vec") // double array: ineligible
    TxLog.init(noStats, p2)
    TxLog.sizeFallbackStats.set(0L)
    val b = TxLog.versionAddBytes(p2, 0L, conf)
    TxLog.sizeFallbackStats.get() should be > 0L
    b shouldBe TxLog.snapshot(p2).files
      .map(f => new java.io.File(p2, f).length()).sum
  }

  test("vacuum dryRun reports without touching anything; readerFloor fires the lag alert") {
    val path = freshPath()
    TxLog.init(rows(0 until 50), path)
    (1 to 5).foreach(v => TxLog.append(rows(v * 100 until v * 100 + 10), path, v - 1L))
    val allVersions = (0L to 5L)
    val dry = TxLog.vacuum(path, retainVersions = 2, minAgeMs = 0L, dryRun = true)
    dry should not be empty
    // NOTHING happened: every version still readable, no checkpoint moved
    allVersions.foreach(v => TxLog.read(spark, path, Some(v)).count())
    // real run with a lagging reader floor: alert BEFORE the drop
    val sink = new graft.runner.Alerts.CollectingSink
    val dropped = TxLog.vacuum(path, retainVersions = 2, minAgeMs = 0L,
      readerFloor = Some(2L), alerts = Some(sink))
    dropped.toSet shouldBe dry.toSet
    val a = sink.alerts.filter(_.severity == "txlog_vacuum_breaks_reader")
    a should have size 1
    a.head.message should include("reader floor 2")
    // the lagging reader now fails only below the horizon (as documented)
    intercept[Exception] { TxLog.read(spark, path, Some(1L)).count() }
    TxLog.read(spark, path, Some(4L)).count() shouldBe 90L
    // a floor entirely above the dropped range stays silent
    val sink2 = new graft.runner.Alerts.CollectingSink
    TxLog.vacuum(path, retainVersions = 2, minAgeMs = 0L,
      readerFloor = Some(5L), alerts = Some(sink2))
    sink2.alerts shouldBe empty
  }

  test("DV mutation property fuzz: random update/merge/delete histories stay model-exact and CDF-complete") {
    import org.apache.spark.sql.functions.col
    // random op sequences over the FULL mutation family (append, DV
    // update, DV merge, DV delete, classic delete, purge, compact)
    // against a driver-side id→cents model. After EVERY op the visible
    // table equals the model exactly (values, not just membership — an
    // update that double-applied, resurrected an old image, or missed a
    // vectored row shows up as a cents mismatch); at the end the keyed
    // CDF consumer AND the multiset mirror both reconstruct the table
    // from the feed alone.
    def df(m: Seq[(Long, Long)]): org.apache.spark.sql.DataFrame =
      m.toDF("id", "cents")
    def pairs(d: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      d.select("id", "cents").as[(Long, Long)].collect().sortBy(_._1)
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + 0xC2B2AE35L)
      val path = freshPath()
      val model = scala.collection.mutable.Map[Long, Long]()
      (0L until 40L).foreach(i => model(i) = i * 10L)
      TxLog.init(df(model.toSeq).repartitionByRange(4, col("id")), path)
      var v = 0L
      def check(): Unit = withClue(s"seed=$seed v=$v: ") {
        pairs(TxLog.read(spark, path)) shouldBe model.toArray.sortBy(_._1)
      }
      check()
      (0 until 12).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 => // append fresh ids
            val base = 100L + rnd.nextLong(400L)
            val fresh = (base until base + 1 + rnd.nextLong(12L))
              .filterNot(model.contains).map(i => i -> (i * 10L))
            if (fresh.nonEmpty) {
              TxLog.append(df(fresh), path, v); v += 1
              model ++= fresh
            }
          case 2 | 3 => // DV UPDATE: bump cents on a modular slice
            val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
            val delta = 1L + rnd.nextLong(9L)
            TxLog.updateWhereDV(spark, path, col("id") % m === r,
              Map("cents" -> (col("cents") + delta)), v); v += 1
            model.keys.filter(k => ((k % m) + m) % m == r)
              .foreach(k => model(k) += delta)
          case 4 => // DV MERGE: replace a sampled key slice + add fresh
            val ks = rnd.shuffle(model.keys.toSeq.sorted)
              .take(rnd.nextInt(6)) ++ Seq(9999L) // incl. an absent key
            val base = 700L + rnd.nextLong(100L)
            val newData = (ks.filter(_ != 9999L).take(2).map(k =>
              k -> (k * 10L + 5L)) ++
              (base until base + 3L).filterNot(model.contains)
                .map(i => i -> (i * 10L))).distinct
            TxLog.replaceWhereKeysDV(spark, path,
              df(ks.map(k => k -> 0L)).select("id"), Seq("id"),
              df(newData), v); v += 1
            ks.foreach(model.remove)
            model ++= newData
          case 5 => // DV delete
            val cut = rnd.nextLong(500L)
            TxLog.deleteWhereDV(spark, path, col("id") >= cut, v); v += 1
            model.keys.filter(_ >= cut).toSeq.foreach(model.remove)
          case 6 => // classic rewriting delete interleaves
            val m = 3 + rnd.nextInt(5)
            TxLog.deleteWhere(spark, path, col("id") % m === 1, v); v += 1
            model.keys.filter(k => ((k % m) + m) % m == 1).toSeq
              .foreach(model.remove)
          case 7 => // purge (visibility-neutral)
            v = TxLog.purgeDeletes(spark, path, v).version
          case 8 => // compact (visibility-neutral, sheds vectors)
            v = TxLog.compact(spark, path, v,
              sortCols = if (rnd.nextBoolean()) Seq("id") else Nil).version
          case _ => // DV update adding a NEW column once in a while is
            // covered by the dedicated spec; here keep cents-only but
            // exercise the no-match path
            TxLog.updateWhereDV(spark, path, col("id") === -12345L,
              Map("cents" -> lit(0L)), v); v += 1
        }
        check()
      }
      // the feed reconstructs the final table both ways
      pairs(TxLog.mergeByKeyFromChanges(spark, path, Seq("id"))) shouldBe
        model.toArray.sortBy(_._1)
      pairs(TxLog.mirrorFromChanges(spark, path)) shouldBe
        model.toArray.sortBy(_._1)
    }
  }

  test("committedReaderFloor reads the last COMMITTED offset from a real checkpoint") {
    import org.apache.spark.sql.functions.col
    val path = freshPath()
    TxLog.init(rows(0 until 20).repartitionByRange(2, col("id")), path)
    TxLog.append(rows(20 until 30), path, 0L)
    TxLog.append(rows(30 until 40), path, 1L)
    val work = java.nio.file.Files.createTempDirectory("txfloor").toString
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 4)
    val q = child.readStream.format("graft-txlog").option("path", path).load()
      .writeStream.format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // the query committed versions 0..2 → the floor is 3: vacuum may
    // drop 0..2 without breaking a restart
    graft.streaming.TxLogSource.committedReaderFloor(spark, s"$work/ckpt") shouldBe 3L
    // a never-started checkpoint floors at 0 (needs everything)
    graft.streaming.TxLogSource.committedReaderFloor(spark, s"$work/nope") shouldBe 0L
    // wire it through vacuum: retention keeping 3.. stays silent
    TxLog.append(rows(40 until 50), path, 2L) // v3 so retain=1 keeps it
    val sink = new graft.runner.Alerts.CollectingSink
    TxLog.vacuum(path, retainVersions = 1, minAgeMs = 0L,
      readerFloor = Some(
        graft.streaming.TxLogSource.committedReaderFloor(spark, s"$work/ckpt")),
      alerts = Some(sink))
    // dropped versions 0..2 are all BELOW the committed floor 3: silent
    sink.alerts shouldBe empty
    // and the restarted query still works (serves v3 only)
    val q2 = child.readStream.format("graft-txlog").option("path", path).load()
      .writeStream.format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(s"$work/out").count() shouldBe 50L
  }

  test("txlog_dv_cardinality alert: fires past the threshold, silent " +
      "below it, re-arms after purge (the structured purge nudge)") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartition(2), path)
    val sink = new graft.runner.Alerts.CollectingSink
    val saved = TxLog.dvCardinalityAlertRows.get()
    TxLog.dvCardinalityAlertRows.set(10L)
    try {
      // 5 dead rows <= 10: no alert
      TxLog.deleteWhereDV(spark, path, col("id") < 5L, 0L,
        alerts = Some(sink))
      sink.alerts.map(_.severity) should not contain "txlog_dv_cardinality"
      // +35 dead rows (40 total) > 10: alert, with the measured count
      TxLog.deleteWhereDV(spark, path, col("id") < 40L, 1L,
        alerts = Some(sink))
      val a = sink.alerts.filter(_.severity == "txlog_dv_cardinality")
      a should not be empty
      a.last.message should include("40 deleted rows")
      a.last.message should include("purgeDeletes")
      // a DV UPDATE on the still-vectored table alerts too
      TxLog.updateWhereDV(spark, path, col("id") === 50L,
        Map("cents" -> lit(999L)), 2L, alerts = Some(sink))
      sink.alerts.count(_.severity == "txlog_dv_cardinality") shouldBe 2
      // purge sheds the vectors; a small new delete stays silent
      TxLog.purgeDeletes(spark, path, 3L)
      TxLog.deleteWhereDV(spark, path, col("id") === 60L, 4L,
        alerts = Some(sink))
      sink.alerts.count(_.severity == "txlog_dv_cardinality") shouldBe 2
    } finally TxLog.dvCardinalityAlertRows.set(saved)
  }

  test("keyed CDF consumer folding across an addColumn boundary " +
      "reconstructs the evolved table exactly (Delta-CDF parity pinned " +
      "by behavior, not prose)") {
    val path = freshPath()
    TxLog.init(rows(0 until 60).repartition(2), path)             // v0
    TxLog.replaceWhereKeys(spark, path, rows(10 until 20).select("id"),
      Seq("id"), rows(10 until 20).withColumn("cents", lit(777L)), 0L) // v1
    TxLog.addColumn(spark, path, "flag",
      org.apache.spark.sql.types.LongType, 1L)                    // v2
    // post-evolution writes materialize the column; pre-evolution rows
    // must come back NULL through the FEED, not just through reads
    TxLog.append(rows(100 until 120).withColumn("flag", col("id") % 7L),
      path, 2L)                                                   // v3
    TxLog.replaceWhereKeysDV(spark, path, rows(15 until 25).select("id"),
      Seq("id"),
      rows(15 until 25).withColumn("cents", lit(888L))
        .withColumn("flag", lit(-1L)), 3L)                        // v4
    val direct = TxLog.read(spark, path)
    direct.columns should contain("flag")
    val folded = TxLog.mergeByKeyFromChanges(spark, path, Seq("id"))
    folded.columns.sorted shouldBe direct.columns.sorted
    val f = folded.select(direct.columns.map(col): _*)
    f.exceptAll(direct).isEmpty shouldBe true
    direct.exceptAll(f).isEmpty shouldBe true
    // and the multiset reference agrees
    val mirror = TxLog.mirrorFromChanges(spark, path)
      .select(direct.columns.map(col): _*)
    mirror.exceptAll(direct).isEmpty shouldBe true
    direct.exceptAll(mirror).isEmpty shouldBe true
  }
}
