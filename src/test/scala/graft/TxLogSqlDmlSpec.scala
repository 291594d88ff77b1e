package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gold.TxLog
import graft.plans.{GraftTxLogAddColumnsCommand, GraftTxLogAddConstraintCommand, GraftTxLogDeleteCommand, GraftTxLogMergeCommand, GraftTxLogUpdateCommand}

/** Native SQL row-level DML + DDL over catalog TxLog tables (round-14
  * verdict item 1): `DELETE FROM` / `UPDATE` / `MERGE INTO` /
  * `ALTER TABLE ADD COLUMNS` / `ADD|DROP CONSTRAINT`.
  *
  * The PLAN-SHAPE PIN the verdict asked for: Spark 4 hands a V1 catalog
  * table fully-ANALYZED `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable` nodes over the `TxLogDvRelation` (execution, not
  * analysis, is what refuses them) — so the post-hoc resolution seam is
  * valid, and these tests assert the analyzer output IS the swapped graft
  * command. If a Spark upgrade starts refusing at analysis (like it
  * already does for ADD/DROP CONSTRAINT, which therefore ride the
  * parser), these pins fail first.
  */
class TxLogSqlDmlSpec extends SparkSpecBase {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    val path = java.nio.file.Files.createTempDirectory("txdml").toString + "/t"
    val table = s"sqldml_t$n"
    (path, table)
  }

  private def baseRows: DataFrame =
    (0 until 200).map(i => (i.toLong, s"g${i % 4}", i.toLong * 10))
      .toDF("id", "grp", "cents")

  private def register(path: String, table: String,
      opts: Map[String, String] = Map.empty): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val extra = opts.map { case (k, v) => s", $k '$v'" }.mkString
    spark.sql(s"CREATE TABLE $table USING `graft-txlog` " +
      s"OPTIONS (path '$path'$extra)")
  }

  private def analyzed(sql: String) =
    spark.sessionState.analyzer.executeAndCheck(
      spark.sessionState.sqlParser.parsePlan(sql),
      new org.apache.spark.sql.catalyst.QueryPlanningTracker())

  test("plan-shape pin: DELETE/UPDATE/MERGE analyze onto the graft commands") {
    val (path, table) = fresh()
    TxLog.init(baseRows, path)
    register(path, table)
    baseRows.limit(3).createOrReplaceTempView("dml_pin_src")
    analyzed(s"DELETE FROM $table WHERE cents < 50") shouldBe
      a[GraftTxLogDeleteCommand]
    analyzed(s"UPDATE $table SET cents = cents + 1 WHERE grp = 'g0'") shouldBe
      a[GraftTxLogUpdateCommand]
    analyzed(
      s"""MERGE INTO $table USING dml_pin_src ON $table.id = dml_pin_src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin) shouldBe
      a[GraftTxLogMergeCommand]
    analyzed(s"ALTER TABLE $table ADD COLUMNS (extra BIGINT)") shouldBe
      a[GraftTxLogAddColumnsCommand]
    analyzed(s"ALTER TABLE $table ADD CONSTRAINT pin_c CHECK (cents >= 0)")
      .shouldBe(a[GraftTxLogAddConstraintCommand])
  }

  test("SQL DELETE == deleteWhereDV twin, soft (no file churn)") {
    val (path, table) = fresh()
    val (twinPath, _) = fresh()
    TxLog.init(baseRows.repartitionByRange(4, col("id")), path)
    TxLog.init(baseRows.repartitionByRange(4, col("id")), twinPath)
    register(path, table)
    val filesBefore = TxLog.snapshot(path).files.toSet
    spark.sql(s"DELETE FROM $table WHERE cents % 30 = 0 AND id < 100")
      .as[Long].head() shouldBe 1L
    TxLog.commitWithRetry(twinPath)(v => TxLog.deleteWhereDV(spark, twinPath,
      col("cents") % 30 === 0 && col("id") < 100, v))
    val viaSql = spark.sql(s"SELECT * FROM $table")
    val twin = TxLog.read(spark, twinPath)
    viaSql.exceptAll(twin).isEmpty shouldBe true
    twin.exceptAll(viaSql).isEmpty shouldBe true
    // DV soft delete: the data-file set is untouched
    TxLog.snapshot(path).files.toSet shouldBe filesBefore
    TxLog.commitInfos(path).head.operation shouldBe Some("DELETE_DV")
  }

  test("SQL UPDATE == updateWhereDV twin; NULL predicate rows survive") {
    val (path, table) = fresh()
    val (twinPath, _) = fresh()
    val withNulls = baseRows.withColumn("grp",
      when(col("id") % 7 === 0, lit(null)).otherwise(col("grp")))
    TxLog.init(withNulls, path)
    TxLog.init(withNulls, twinPath)
    register(path, table)
    spark.sql(s"UPDATE $table SET cents = cents * 2 + 1 " +
      s"WHERE grp = 'g1' OR grp IS NULL AND id < 50").collect()
    TxLog.commitWithRetry(twinPath)(v => TxLog.updateWhereDV(spark, twinPath,
      col("grp") === "g1" || col("grp").isNull && col("id") < 50,
      Map("cents" -> (col("cents") * 2 + 1)), v))
    val viaSql = spark.sql(s"SELECT * FROM $table")
    val twin = TxLog.read(spark, twinPath)
    viaSql.exceptAll(twin).isEmpty shouldBe true
    twin.exceptAll(viaSql).isEmpty shouldBe true
  }

  test("SQL MERGE upsert == replaceWhereKeysDV twin; partial/delete/insert-only shapes") {
    val (path, table) = fresh()
    val (twinPath, _) = fresh()
    TxLog.init(baseRows, path)
    TxLog.init(baseRows, twinPath)
    register(path, table)
    val src = (150 until 250).map(i => (i.toLong, "m", i.toLong)).toDF(
      "id", "grp", "cents")
    src.createOrReplaceTempView("merge_src_full")
    spark.sql(
      s"""MERGE INTO $table USING merge_src_full ON $table.id = merge_src_full.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    TxLog.commitWithRetry(twinPath)(v => TxLog.replaceWhereKeysDV(spark,
      twinPath, src.select("id"), Seq("id"), src, v))
    val viaSql = spark.sql(s"SELECT * FROM $table")
    viaSql.exceptAll(TxLog.read(spark, twinPath)).isEmpty shouldBe true
    TxLog.read(spark, twinPath).exceptAll(viaSql).isEmpty shouldBe true

    // partial update referencing both sides
    Seq((160L, 5L), (170L, 7L)).toDF("id", "delta")
      .createOrReplaceTempView("merge_src_delta")
    spark.sql(
      s"""MERGE INTO $table USING merge_src_delta ON $table.id = merge_src_delta.id
         |WHEN MATCHED THEN UPDATE SET cents = $table.cents + merge_src_delta.delta""".stripMargin)
      .collect()
    spark.sql(s"SELECT cents FROM $table WHERE id = 160").as[Long].head() shouldBe 165L
    spark.sql(s"SELECT cents FROM $table WHERE id = 170").as[Long].head() shouldBe 177L
    spark.sql(s"SELECT grp FROM $table WHERE id = 160").as[String].head() shouldBe "m"

    // delete-only
    Seq(Tuple1(160L), Tuple1(9999L)).toDF("id")
      .createOrReplaceTempView("merge_src_del")
    spark.sql(
      s"""MERGE INTO $table USING merge_src_del ON $table.id = merge_src_del.id
         |WHEN MATCHED THEN DELETE""".stripMargin).collect()
    spark.sql(s"SELECT count(*) FROM $table WHERE id = 160")
      .as[Long].head() shouldBe 0L

    // insert-only: matched rows untouched
    Seq((170L, "XX", 1L), (300L, "new", 42L)).toDF("id", "grp", "cents")
      .createOrReplaceTempView("merge_src_ins")
    spark.sql(
      s"""MERGE INTO $table USING merge_src_ins ON $table.id = merge_src_ins.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    spark.sql(s"SELECT grp FROM $table WHERE id = 170").as[String].head() shouldBe "m"
    spark.sql(s"SELECT cents FROM $table WHERE id = 300").as[Long].head() shouldBe 42L
  }

  test("refusals: time travel, correlated/scalar subqueries, non-equality ON, cardinality") {
    val (path, table) = fresh()
    TxLog.init(baseRows, path)
    TxLog.append(baseRows.limit(1), path, 0L)
    register(path, table)
    val (_, frozen) = (path, s"${table}_frozen")
    spark.sql(s"DROP TABLE IF EXISTS $frozen")
    spark.sql(s"CREATE TABLE $frozen USING `graft-txlog` " +
      s"OPTIONS (path '$path', versionAsOf '0')")
    intercept[Exception] {
      spark.sql(s"DELETE FROM $frozen WHERE id = 1").collect()
    }.getMessage should include("frozen view")
    intercept[Exception] {
      spark.sql(s"UPDATE $frozen SET cents = 0 WHERE id = 1").collect()
    }.getMessage should include("frozen view")

    baseRows.limit(5).createOrReplaceTempView("refusal_src")
    // CORRELATED subqueries (and non-IN shapes) still refuse with the
    // rewrite guidance; plain IN-subqueries now compile (own test below)
    intercept[Exception] {
      spark.sql(s"DELETE FROM $table WHERE EXISTS " +
        s"(SELECT 1 FROM refusal_src r WHERE r.id = $table.id)").collect()
    }.getMessage should include("subquery")
    intercept[Exception] {
      spark.sql(s"UPDATE $table SET cents = " +
        "(SELECT max(cents) FROM refusal_src) WHERE id = 1").collect()
    }.getMessage should include("subquery")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $table USING refusal_src
           |ON $table.id < refusal_src.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    }.getMessage should include("equality")

    // Delta's cardinality violation: duplicate source keys matching rows
    Seq((10L, "p", 1L), (10L, "q", 2L)).toDF("id", "grp", "cents")
      .createOrReplaceTempView("dup_src")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $table USING dup_src ON $table.id = dup_src.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    }.getMessage should include("duplicate key")
    // ...but duplicate keys that only INSERT are legal (standard SQL)
    Seq((900L, "p", 1L), (900L, "q", 2L)).toDF("id", "grp", "cents")
      .createOrReplaceTempView("dup_ins_src")
    spark.sql(
      s"""MERGE INTO $table USING dup_ins_src ON $table.id = dup_ins_src.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    spark.sql(s"SELECT count(*) FROM $table WHERE id = 900")
      .as[Long].head() shouldBe 2L
  }

  test("conditional MERGE clauses via SQL: first-match-wins, conditional " +
      "insert, NOT MATCHED BY SOURCE - one DV commit, model-checked") {
    val (path, table) = fresh()
    TxLog.init(baseRows, path)          // ids 0..199, cents = id*10
    register(path, table)
    ((150 until 250).map(i => (i.toLong, i.toLong)))
      .toDF("sid", "bonus").createOrReplaceTempView("cond_src")
    val v = spark.sql(
      s"""MERGE INTO $table USING cond_src ON $table.id = cond_src.sid
         |WHEN MATCHED AND cond_src.bonus % 2 = 0 THEN DELETE
         |WHEN MATCHED AND $table.cents >= 1700 THEN
         |  UPDATE SET cents = $table.cents + cond_src.bonus
         |WHEN MATCHED THEN UPDATE SET grp = 'tail'
         |WHEN NOT MATCHED AND cond_src.sid < 230 THEN
         |  INSERT (id, grp, cents) VALUES (cond_src.sid, 'new', cond_src.bonus)
         |WHEN NOT MATCHED BY SOURCE AND $table.id < 20 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND $table.grp = 'g3' THEN
         |  UPDATE SET cents = 0""".stripMargin).as[Long].head()
    v shouldBe 1L
    val model = (0 until 200).flatMap { i =>
      val id = i.toLong; val cents = id * 10
      if (id >= 150) { // matched (source 150..249 ∩ target)
        if (id % 2 == 0) None
        else if (cents >= 1700) Some((id, s"g${i % 4}", cents + id))
        else Some((id, "tail", cents))
      } else if (id < 20) None
      else if (i % 4 == 3) Some((id, s"g${i % 4}", 0L))
      else Some((id, s"g${i % 4}", cents))
    } ++ (200 until 230).collect { case i => (i.toLong, "new", i.toLong) }
    spark.sql(s"SELECT id, grp, cents FROM $table")
      .as[(Long, String, Long)].collect().sortBy(_._1) shouldBe
      model.sortBy(_._1)
    // one committed version, no data files removed (soft path)
    TxLog.snapshot(path).files.size should be >=
      TxLog.snapshot(path, Some(0L)).files.size
  }

  test("DELETE/UPDATE with IN-subquery compile onto the keyed MERGE " +
      "path; residual conjuncts apply per row; duplicates in the " +
      "subquery are IN-collapsed") {
    val (path, table) = fresh()
    TxLog.init(baseRows, path)
    register(path, table)
    // subquery WITH duplicates (union all of the same slice): IN
    // semantics dedupe - no cardinality refusal
    spark.sql(
      s"""SELECT id FROM $table WHERE id < 30
         |UNION ALL SELECT id FROM $table WHERE id < 30""".stripMargin)
      .createOrReplaceTempView("del_keys")
    spark.sql(s"DELETE FROM $table WHERE id IN (SELECT id FROM del_keys) " +
      "AND grp = 'g1'").collect()
    // residual per row: only g1 rows among ids 0..29 died (id%4==1)
    spark.sql(s"SELECT count(*) FROM $table WHERE id < 30")
      .as[Long].head() shouldBe (0 until 30).count(_ % 4 != 1).toLong
    spark.sql(s"SELECT count(*) FROM $table").as[Long].head() shouldBe
      (200 - (0 until 30).count(_ % 4 == 1)).toLong
    // UPDATE ... IN (SELECT ...): assignments over the original row
    spark.sql(s"UPDATE $table SET cents = cents + 1 WHERE id IN " +
      s"(SELECT id FROM del_keys WHERE id >= 20)").collect()
    spark.sql(s"SELECT sum(cents) FROM $table WHERE id >= 20 AND id < 30")
      .as[Long].head() shouldBe
      (20 until 30).filter(_ % 4 != 1).map(i => i * 10L + 1L).sum
    // the untouched tail is untouched
    spark.sql(s"SELECT sum(cents) FROM $table WHERE id >= 30")
      .as[Long].head() shouldBe (30 until 200).map(_ * 10L).sum
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only, catalog re-pinned, SQL sees it") {
    val (path, table) = fresh()
    TxLog.init(baseRows, path)
    register(path, table)
    val filesBefore = TxLog.snapshot(path).files.toSet
    spark.sql(s"ALTER TABLE $table ADD COLUMNS (flag BIGINT, note STRING)")
      .collect()
    TxLog.snapshot(path).files.toSet shouldBe filesBefore // metadata-only
    // the catalog schema was re-pinned: SQL resolves the new columns with
    // NO manual re-registration (round-13's stale-schema refusal would
    // otherwise fire here)
    spark.table(table).schema.fieldNames shouldBe
      Array("id", "grp", "cents", "flag", "note")
    spark.sql(s"SELECT count(*) FROM $table WHERE flag IS NULL")
      .as[Long].head() shouldBe 200L
    spark.sql(s"INSERT INTO $table VALUES (1000, 'gx', 5, 9, 'hello')")
    spark.sql(s"SELECT note FROM $table WHERE id = 1000")
      .as[String].head() shouldBe "hello"
  }

  test("ADD/DROP CONSTRAINT via SQL: enforced, droppable, IF EXISTS, refusals") {
    val (path, table) = fresh()
    TxLog.init(baseRows, path)
    register(path, table)
    spark.sql(s"ALTER TABLE $table ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
      .collect()
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $table VALUES (1001, 'gx', -5)")
    }
    e.getMessage should include("cents_pos")
    spark.sql(s"ALTER TABLE $table DROP CONSTRAINT cents_pos").collect()
    spark.sql(s"INSERT INTO $table VALUES (1001, 'gx', -5)")
    spark.sql(s"SELECT count(*) FROM $table WHERE cents < 0")
      .as[Long].head() shouldBe 1L
    // IF EXISTS on an absent name: no-op, no error
    spark.sql(s"ALTER TABLE $table DROP CONSTRAINT IF EXISTS ghost").collect()
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $table DROP CONSTRAINT ghost").collect()
    }.getMessage should include("ghost")
    // non-txlog tables refuse with the unsupported-operation message
    spark.sql("DROP TABLE IF EXISTS sqldml_plain")
    graft.core.Fs.rmTree(new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse/sqldml_plain"))
    Seq((1L, 2L)).toDF("a", "b").write.mode("overwrite")
      .saveAsTable("sqldml_plain")
    intercept[Exception] {
      spark.sql("ALTER TABLE sqldml_plain ADD CONSTRAINT c CHECK (a > 0)")
        .collect()
    }.getMessage should include("not supported")
  }

  test("SQL DML property fuzz: randomly RENDERED DELETE/UPDATE/MERGE " +
      "(conditional clauses, BY SOURCE, IN-subquery) through the catalog " +
      "table stay model-exact; per-file-bitmap read lottery") {
    def pairs(t: String): Array[(Long, Long)] =
      spark.sql(s"SELECT id, cents FROM $t")
        .as[(Long, Long)].collect().sortBy(_._1)
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + 31L)
      val (path, table) = fresh()
      val model = scala.collection.mutable.Map[Long, Long]()
      (0L until 40L).foreach(i => model(i) = i * 10L)
      TxLog.init(model.toSeq.toDF("id", "cents")
        .repartitionByRange(4, col("id")), path)
      register(path, table)
      // bitmap lottery: odd seeds run EVERY read (SELECT, DML probes,
      // survivor/live-row reads) through the per-file bitmap path
      val saved = TxLog.dvBitmapMinRows.get()
      if (seed % 2 == 1) TxLog.dvBitmapMinRows.set(0L)
      try {
        var step = 0
        def check(): Unit = withClue(s"seed=$seed step=$step: ") {
          pairs(table) shouldBe model.toArray.sortBy(_._1)
        }
        check()
        (0 until 10).foreach { _ =>
          step += 1
          rnd.nextInt(6) match {
            case 0 => // SQL INSERT of fresh ids
              val base = 100L + rnd.nextLong(800L)
              val fresh = (base until base + 1 + rnd.nextLong(6L))
                .filterNot(model.contains).map(i => (i, i * 10L))
              if (fresh.nonEmpty) {
                spark.sql(s"INSERT INTO $table VALUES " +
                  fresh.map { case (i, c) => s"($i, $c)" }.mkString(", "))
                model ++= fresh
              }
            case 1 => // plain predicate DELETE
              val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
              val cut = rnd.nextLong(9000L)
              spark.sql(
                s"DELETE FROM $table WHERE id % $m = $r AND cents < $cut")
              model.filter { case (k, c) => k % m == r && c < cut }
                .keys.toSeq.foreach(model.remove)
            case 2 => // UPDATE over the original row
              val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
              val d = 1L + rnd.nextLong(9L)
              spark.sql(s"UPDATE $table SET cents = cents + $d " +
                s"WHERE id % $m = $r")
              model.keys.filter(_ % m == r).foreach(k => model(k) += d)
            case 3 => // IN-subquery DELETE (self-referential) + residual
              val k = 2 + rnd.nextInt(4); val j = rnd.nextInt(k)
              val cut = rnd.nextLong(200L)
              spark.sql(s"DELETE FROM $table WHERE id IN " +
                s"(SELECT id FROM $table WHERE cents % $k = $j) " +
                s"AND id >= $cut")
              model.filter { case (key, c) => c % k == j && key >= cut }
                .keys.toSeq.foreach(model.remove)
            case 4 => // conditional multi-clause MERGE with BY SOURCE
              val sampled = rnd.shuffle(model.keys.toSeq.sorted)
                .take(rnd.nextInt(6))
              val base = 2000L + rnd.nextLong(500L)
              val freshIds = (base until base + 3L)
                .filterNot(model.contains)
              val src = (sampled ++ freshIds).distinct
                .map(i => (i, i % 5 + 1))
              if (src.nonEmpty) {
                src.toDF("sid", "delta")
                  .createOrReplaceTempView("fuzz_mrg_src")
                val q = 2 + rnd.nextInt(4); val w = rnd.nextInt(q)
                spark.sql(
                  s"""MERGE INTO $table USING fuzz_mrg_src
                     |ON $table.id = fuzz_mrg_src.sid
                     |WHEN MATCHED AND fuzz_mrg_src.delta % 2 = 0
                     |  THEN DELETE
                     |WHEN MATCHED THEN
                     |  UPDATE SET cents = $table.cents + fuzz_mrg_src.delta
                     |WHEN NOT MATCHED AND fuzz_mrg_src.sid % 2 = 0 THEN
                     |  INSERT (id, cents)
                     |  VALUES (fuzz_mrg_src.sid, fuzz_mrg_src.delta)
                     |WHEN NOT MATCHED BY SOURCE AND $table.id % $q = $w
                     |  THEN UPDATE SET cents = 0""".stripMargin)
                val srcMap = src.toMap
                val matchedKeys = model.keys.toSet.intersect(srcMap.keySet)
                val orphans = model.keys.toSet -- srcMap.keySet
                matchedKeys.foreach { k =>
                  val d = srcMap(k)
                  if (d % 2 == 0) model.remove(k) else model(k) += d
                }
                srcMap.keySet.diff(matchedKeys).foreach { k =>
                  if (k % 2 == 0) model(k) = srcMap(k)
                }
                orphans.filter(_ % q == w).foreach(k => model(k) = 0L)
              }
            case _ => // purge/compact housekeeping (visibility-neutral)
              val v = TxLog.currentVersion(path).get
              if (rnd.nextBoolean()) TxLog.purgeDeletes(spark, path, v)
              else TxLog.compact(spark, path, v)
              spark.catalog.refreshByPath(path)
              org.apache.spark.sql.graftbridge.CatalogBridge
                .invalidateCachedRelations(spark)
          }
          check()
        }
        // the feed still reconstructs the final table
        TxLog.mirrorFromChanges(spark, path)
          .select("id", "cents").as[(Long, Long)].collect()
          .sortBy(_._1) shouldBe model.toArray.sortBy(_._1)
      } finally TxLog.dvBitmapMinRows.set(saved)
    }
  }

  test("regression: catalog SELECT over >= 2 DV sidecars (ResolvedHint splice)") {
    // round-13 latent bug: ExpandTxLogDvScan spliced the analyzed native
    // plan WITH its broadcast ResolvedHint after the optimizer's hint
    // elimination; planning then died ("ResolvedHint operator should have
    // been replaced") exactly when the DV side was a UNION of >= 2
    // sidecar files. Two DV commits touching DIFFERENT files reproduce.
    val (path, table) = fresh()
    TxLog.init(baseRows.repartitionByRange(4, col("id")), path)
    register(path, table)
    spark.sql(s"DELETE FROM $table WHERE id = 5").collect()
    spark.sql(s"DELETE FROM $table WHERE id = 180").collect()
    TxLog.snapshot(path).dvs.values.toSet.size should be >= 2
    spark.sql(s"SELECT count(*) FROM $table").as[Long].head() shouldBe 198L
    // and through the path-based format read too
    spark.read.format("graft-txlog").option("path", path).load()
      .count() shouldBe 198L
  }
}
