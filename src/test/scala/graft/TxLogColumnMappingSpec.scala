package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** COLUMN MAPPING (round-14 verdict item 7 — the Delta column-mapping
  * shape): metadata-only RENAME and DROP through a logical→physical name
  * indirection recorded in the log. Files never rewrite; reads logicalize
  * and writes physicalize at the two shared IO seams, so every read path
  * and every committer composes. The sharpest contract here is the
  * RESURRECT GUARD: a dropped column's physical name is tombstoned, so a
  * re-added column of the same name reads NULL for old rows instead of
  * the dropped values.
  */
class TxLogColumnMappingSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("txcolmap").toString + "/t"

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i", (i % 5).toLong)).toDF("id", "payload", "cents")

  private def partFiles(path: String): Set[String] =
    TxLog.snapshot(path).files.toSet

  test("rename: metadata-only, every read path serves the new name, time " +
      "travel serves the old, restore rolls back") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartition(2), path) // v0
    val filesBefore = partFiles(path)
    TxLog.renameColumn(path, "cents", "amount", 0L)    // v1
    partFiles(path) shouldBe filesBefore // zero rewrite
    val r = TxLog.read(spark, path)
    r.columns shouldBe Array("id", "payload", "amount")
    r.agg(sum("amount")).head().getLong(0) shouldBe
      (0 until 100).map(_ % 5).sum.toLong
    // time travel below the rename: the OLD name (mapping is versioned)
    TxLog.read(spark, path, asOf = Some(0L)).columns should contain("cents")
    // writes under the new name land in the files as the PHYSICAL name
    TxLog.append(rows(100 until 120)
      .withColumnRenamed("cents", "amount"), path, 1L) // v2
    val all = TxLog.read(spark, path)
    all.count() shouldBe 120L
    all.agg(sum("amount")).head().getLong(0) shouldBe
      ((0 until 100) ++ (100 until 120)).map(_ % 5).sum.toLong
    // pruned read by the LOGICAL name still prunes (stats physical-keyed)
    val (kept, total) = TxLog.statsPrunedFilesCanonical(path, "id", 0L, 50L)
    kept.size should be < total
    TxLog.readPruned(spark, path, "id", 0L, 10L)
      .filter(col("id") <= 10L).count() shouldBe 11L
    // restore to v0: the old name comes back
    TxLog.restore(path, 0L, 2L) // v3
    TxLog.read(spark, path).columns should contain("cents")
    TxLog.read(spark, path).count() shouldBe 100L
  }

  test("drop + re-add: the RESURRECT GUARD - old rows read NULL, never " +
      "the dropped values") {
    val path = freshPath()
    TxLog.init(rows(0 until 60).repartition(2), path)  // v0
    TxLog.dropColumn(path, "cents", 0L)                // v1
    TxLog.read(spark, path).columns shouldBe Array("id", "payload")
    partFiles(path) shouldBe TxLog.snapshot(path, Some(0L)).files.toSet
    // re-add the SAME logical name: fresh physical, typed NULL everywhere
    TxLog.addColumn(spark, path, "cents", LongType, 1L) // v2
    val r = TxLog.read(spark, path)
    r.columns shouldBe Array("id", "payload", "cents")
    r.filter(col("cents").isNotNull).count() shouldBe 0L // NO leak
    // new writes materialize the re-added column
    TxLog.append(rows(100 until 110), path, 2L)        // v3
    val all = TxLog.read(spark, path)
    all.filter(col("cents").isNotNull).count() shouldBe 10L
    all.agg(sum("cents")).head().getLong(0) shouldBe
      (100 until 110).map(_ % 5).sum.toLong
    // and time travel below the drop still serves the ORIGINAL values
    TxLog.read(spark, path, asOf = Some(0L))
      .agg(sum("cents")).head().getLong(0) shouldBe
      (0 until 60).map(_ % 5).sum.toLong
  }

  test("mapping composes with DV mutations, deleteWhere rewrites and compact") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartition(4), path)   // v0
    TxLog.renameColumn(path, "cents", "amount", 0L)      // v1
    // DV soft delete by the NEW name
    TxLog.deleteWhereDV(spark, path, col("amount") === 4L, 1L) // v2
    TxLog.read(spark, path).count() shouldBe 80L
    // DV update by the new name; images carry the physical column
    TxLog.updateWhereDV(spark, path, col("id") === 0L,
      Map("amount" -> lit(999L)), 2L)                    // v3
    TxLog.read(spark, path).filter(col("id") === 0L)
      .select("amount").head().getLong(0) shouldBe 999L
    // classic rewrite delete
    TxLog.deleteWhere(spark, path, col("amount") === 3L, 3L) // v4
    TxLog.read(spark, path).count() shouldBe 60L
    // compact sheds vectors and keeps the mapping
    val snap = TxLog.compact(spark, path, 4L, maxFileBytes = Long.MaxValue)
    snap.columnMap.nonEmpty shouldBe true
    val r = TxLog.read(spark, path)
    r.count() shouldBe 60L
    r.columns shouldBe Array("id", "payload", "amount")
    // keyed merge after rename
    TxLog.replaceWhereKeysDV(spark, path,
      Seq(Tuple1(1L)).toDF("id"), Seq("id"),
      Seq((1L, "zz", 777L)).toDF("id", "payload", "amount"), snap.version)
    TxLog.read(spark, path).filter(col("id") === 1L)
      .select("amount").head().getLong(0) shouldBe 777L
  }

  test("mapping survives checkpoints and vacuum; CDF serves the feed-end names") {
    val path = freshPath()
    TxLog.init(rows(0 until 50).repartition(2), path)    // v0
    TxLog.renameColumn(path, "cents", "amount", 0L)      // v1
    TxLog.dropColumn(path, "payload", 1L)                // v2
    (0 until 9).foreach { i =>
      TxLog.append(rows(100 + i * 10 until 100 + i * 10 + 10)
        .withColumnRenamed("cents", "amount").drop("payload"),
        path, (i + 2).toLong)
    } // ...v11 (v10 checkpointed, carries the map)
    // keyed CDF consumer BEFORE vacuum (the feed is vacuum-bounded):
    // folding across the rename+drop boundary reconstructs the table
    // under the FEED-END names exactly
    val direct0 = TxLog.read(spark, path)
    val folded = TxLog.mergeByKeyFromChanges(spark, path, Seq("id"))
      .select(direct0.columns.map(col): _*)
    folded.exceptAll(direct0).isEmpty shouldBe true
    direct0.exceptAll(folded).isEmpty shouldBe true
    TxLog.vacuum(path, retainVersions = 2, minAgeMs = 0L)
    val r = TxLog.read(spark, path) // resolves THROUGH the checkpoint
    r.columns shouldBe Array("id", "amount")
    r.count() shouldBe 140L
  }

  test("refusals: partition column, constraint-referenced, clashes, last column") {
    val path = freshPath()
    TxLog.init(rows(0 until 50), path, partitionBy = Seq("cents")) // grp-ish
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(path, "cents", "c2", 0L)
    }.getMessage should include("partition column")
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(path, "cents", 0L)
    }.getMessage should include("partition column")
    TxLog.addConstraint(spark, path, "id_pos", "id >= 0", 0L) // v1
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(path, "id", "id2", 1L)
    }.getMessage should include("id_pos")
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(path, "id", 1L)
    }.getMessage should include("id_pos")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(path, "id", "payload", 1L)
    }.getMessage should include("already exists")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(path, "ghost", "g2", 1L)
    }.getMessage should include("no column")
    // the batch format logicalizes mapped tables
    val path2 = freshPath()
    TxLog.init(rows(0 until 20), path2)
    TxLog.renameColumn(path2, "cents", "amount", 0L)
    spark.read.format("graft-txlog").option("path", path2).load()
      .columns should contain("amount")
  }

  test("streaming over a column-mapped table: pinned logical names over " +
      "stable physicals; mid-stream rename streams on under the pinned " +
      "names; resurrect (fresh physical) trips the restart contract; a " +
      "fresh query re-pins and serves tombstone semantics") {
    import org.apache.spark.sql.functions.col
    val path = freshPath()
    val work = java.nio.file.Files.createTempDirectory("cmstream").toString
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 4)

    // v0 data, v1 rename BEFORE the stream starts: a fresh query pins the
    // NEW logical name and serves the old files' values under it
    TxLog.init(rows(0 until 30), path)                       // v0
    TxLog.renameColumn(path, "cents", "amount", 0L)          // v1
    val q = child.readStream.format("graft-txlog").option("path", path)
      .load().writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ck1")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got1 = spark.read.parquet(s"$work/out")
      got1.columns.sorted shouldBe Array("amount", "id", "payload")
      got1.select("id", "amount")
        .as[(Long, Long)].collect().sortBy(_._1) shouldBe
        (0 until 30).map(i => (i.toLong, (i % 5).toLong)).toArray

      // MID-STREAM rename (amount -> money) + a new append on the
      // RUNNING query: physical identity is stable, so the stream
      // serves the new rows' values under the PINNED name (row shape
      // never changes mid-stream)
      TxLog.renameColumn(path, "amount", "money",
        TxLog.currentVersion(path).get)
      TxLog.append(rows(30 until 40).withColumnRenamed("cents", "money"),
        path, TxLog.currentVersion(path).get)
      q.processAllAvailable()
      val got2 = spark.read.parquet(s"$work/out")
      got2.count() shouldBe 40L
      got2.filter(col("id") >= 30L).select("id", "amount")
        .as[(Long, Long)].collect().sortBy(_._1) shouldBe
        (30 until 40).map(i => (i.toLong, (i % 5).toLong)).toArray

      // mid-stream DROP + same-name RE-ADD (resurrect guard = FRESH
      // physical): the pinned read would silently null the re-added
      // column's new values - the widen contract refuses, restart
      // guidance
      val v = TxLog.currentVersion(path).get
      TxLog.dropColumn(path, "money", v)
      TxLog.addColumn(spark, path, "money",
        org.apache.spark.sql.types.LongType, v + 1)
      TxLog.append(rows(40 until 45).withColumnRenamed("cents", "money"),
        path, v + 2)
      val e = intercept[Exception] { q.processAllAvailable() }
      e.getMessage should include("Restart the query")
    } finally q.stop()

    // a FRESH query re-pins the post-resurrect state and serves the
    // TABLE's meaning end-to-end: pre-drop rows NULL money (tombstoned
    // physical never resurrects), post-re-add rows real values
    val q2 = child.readStream.format("graft-txlog").option("path", path)
      .load().writeStream.format("parquet")
      .option("path", s"$work/out2")
      .option("checkpointLocation", s"$work/ck2")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val got3 = spark.read.parquet(s"$work/out2")
    got3.columns.sorted shouldBe Array("id", "money", "payload")
    got3.count() shouldBe 45L
    got3.filter(col("id") < 40L).filter(col("money").isNotNull)
      .count() shouldBe 0L
    got3.filter(col("id") >= 40L).select("id", "money")
      .as[(Long, Long)].collect().sortBy(_._1) shouldBe
      (40 until 45).map(i => (i.toLong, (i % 5).toLong)).toArray

    // the STREAMING CDF source logicalizes too: a fresh feed over the
    // final table emits insert rows under the current logical names
    val cdfQ = child.readStream.format("graft-txlog-cdf")
      .option("path", path).load()
      .writeStream.format("parquet")
      .option("path", s"$work/cdf_out")
      .option("checkpointLocation", s"$work/cdf_ck")
      .outputMode("append").start()
    try cdfQ.processAllAvailable() finally cdfQ.stop()
    val feed = spark.read.parquet(s"$work/cdf_out")
    feed.columns should contain("money")
    feed.filter(col("_change_type") === "insert")
      .filter(col("id") >= 40L).select("money")
      .as[Long].collect().sorted shouldBe
      (40 until 45).map(i => (i % 5).toLong).sorted.toArray
  }

  test("column-mapping property fuzz: random rename/drop/re-add/append/" +
      "delete/compact histories stay model-exact (resurrect guard " +
      "randomized)") {
    // driver-side model: rows as id -> (logical column -> value); the
    // lottery renames, drops (values become unreachable FOREVER), re-adds
    // previously-used names (must read NULL - the resurrect guard),
    // appends under the CURRENT schema, row-deletes, and compacts.
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 104729L)
      val path = freshPath()
      var cols = Vector("c0", "c1", "c2") // + id, always present
      var usedNames = cols.toSet
      var rows = scala.collection.mutable.LinkedHashMap[Long, Map[String, Long]]()
      var nextId = 0L
      def valueOf(id: Long, c: String): Long = id * 31 + c.hashCode % 1000
      def freshRows(n: Int): Seq[(Long, Map[String, Long])] =
        (0 until n).map { _ =>
          val id = nextId; nextId += 1
          id -> cols.map(c => c -> valueOf(id, c)).toMap
        }
      def dfOf(rs: Seq[(Long, Map[String, Long])]) = {
        val schema = StructType(StructField("id", LongType, false) +:
          cols.map(c => StructField(c, LongType, true)))
        val jr = new java.util.ArrayList[org.apache.spark.sql.Row]()
        rs.foreach { case (id, m) =>
          jr.add(org.apache.spark.sql.Row.fromSeq(
            id +: cols.map(c => m(c): java.lang.Long)))
        }
        spark.createDataFrame(jr, schema)
      }
      val first = freshRows(30)
      first.foreach { case (id, m) => rows += id -> m }
      TxLog.init(dfOf(first).repartition(2), path)
      var v = 0L
      for (_ <- 1 to 10) {
        rnd.nextInt(6) match {
          case 0 => // append under the current schema
            val add = freshRows(5 + rnd.nextInt(10))
            add.foreach { case (id, m) => rows += id -> m }
            TxLog.append(dfOf(add), path, v)
          case 1 if cols.nonEmpty => // rename
            val from = cols(rnd.nextInt(cols.size))
            val to = s"r${usedNames.size}_$from"
            usedNames += to
            TxLog.renameColumn(path, from, to, v)
            cols = cols.map(c => if (c == from) to else c)
            rows = rows.map { case (id, m) =>
              id -> m.map { case (c, x) => (if (c == from) to else c, x) }
            }
          case 2 if cols.size > 1 => // drop: values gone forever
            val victim = cols(rnd.nextInt(cols.size))
            TxLog.dropColumn(path, victim, v)
            cols = cols.filterNot(_ == victim)
            rows = rows.map { case (id, m) => id -> (m - victim) }
          case 3 => // re-add a USED name half the time (the leak case)
            val used = (usedNames -- cols).toSeq.sorted
            val name =
              if (used.nonEmpty && rnd.nextBoolean()) used(rnd.nextInt(used.size))
              else { val n = s"n${usedNames.size}"; n }
            usedNames += name
            TxLog.addColumn(spark, path, name, LongType, v)
            cols = cols :+ name // NULL everywhere until appends fill it
          case 4 => // row delete over a live column (or id)
            val k = 2 + rnd.nextInt(4)
            TxLog.deleteWhere(spark, path, col("id") % k === 0L, v)
            rows = rows.filterNot(_._1 % k == 0L)
          case _ =>
            TxLog.compact(spark, path, v)
        }
        v = TxLog.currentVersion(path).get
        val got = TxLog.read(spark, path)
        withClue(s"seed=$seed v=$v cols=$cols: ") {
          // set equality: footer-merge order after drop/re-add cycles is
          // not the recorded order (align only APPENDS missing columns)
          got.columns.toSet shouldBe ("id" +: cols).toSet
          val idIdx = got.columns.indexOf("id")
          val colIdx = cols.map(c => c -> got.columns.indexOf(c))
          val collected = got.collect().map { r =>
            r.getLong(idIdx) -> colIdx.flatMap { case (c, i) =>
              if (r.isNullAt(i)) None else Some(c -> r.getLong(i))
            }.toMap
          }.toMap
          collected.keySet shouldBe rows.keySet
          rows.foreach { case (id, m) =>
            withClue(s"id=$id: ") { collected(id) shouldBe m }
          }
        }
      }
    }
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN route to the mapping, " +
      "catalog re-pinned, SELECT sees the change") {
    val path = freshPath()
    TxLog.init(rows(0 until 40), path)
    spark.sql("DROP TABLE IF EXISTS colmap_t")
    spark.sql(s"CREATE TABLE colmap_t USING `graft-txlog` " +
      s"OPTIONS (path '$path')")
    spark.sql("ALTER TABLE colmap_t RENAME COLUMN cents TO amount").collect()
    spark.table("colmap_t").columns shouldBe
      Array("id", "payload", "amount")
    spark.sql("SELECT sum(amount) FROM colmap_t").as[Long].head() shouldBe
      (0 until 40).map(_ % 5).sum.toLong
    spark.sql("ALTER TABLE colmap_t DROP COLUMN payload").collect()
    spark.table("colmap_t").columns shouldBe Array("id", "amount")
    spark.sql("SELECT count(*) FROM colmap_t").as[Long].head() shouldBe 40L
    // DML over the mapped table still routes through the DV committers
    spark.sql("DELETE FROM colmap_t WHERE amount = 2").collect()
    spark.sql("SELECT count(*) FROM colmap_t").as[Long].head() shouldBe 32L
    spark.sql("ALTER TABLE colmap_t DROP COLUMN IF EXISTS ghost").collect()
    intercept[Exception] {
      spark.sql("ALTER TABLE colmap_t DROP COLUMN ghost").collect()
    }.getMessage should include("ghost")
  }
}
