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

  test("refusals: time travel, subquery, merge shapes, cardinality") {
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
    intercept[Exception] {
      spark.sql(s"DELETE FROM $table WHERE id IN " +
        "(SELECT id FROM refusal_src)").collect()
    }.getMessage should include("subquery")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $table USING refusal_src ON $table.id = refusal_src.id
           |WHEN MATCHED AND refusal_src.cents > 5 THEN UPDATE SET *""".stripMargin)
        .collect()
    }.getMessage should include("conditional")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $table USING refusal_src ON $table.id = refusal_src.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect()
    }.getMessage should include("NOT MATCHED BY SOURCE")
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
