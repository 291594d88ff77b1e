package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._

/** The SQL `CALL` maintenance surface (sqlfront.GraftProcedureCatalog —
  * Spark 4 DSv2 stored procedures, the Iceberg `CALL cat.system.proc`
  * shape): a SQL user drives the whole lakehouse operations toolkit —
  * history, vacuum, compact, restore, partition deletes, clone,
  * constraints — without the Scala API.
  */
class GraftProcedureCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft_sys",
    "graft.sqlfront.GraftProcedureCatalog")

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("txlogproc").toString + "/t"

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i", (i % 4).toLong)).toDF("id", "payload", "grp")

  test("CALL snapshot + history: read-only metadata procedures") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartition(2), path,
      partitionBy = Seq("grp"))
    TxLog.append(rows(100 until 150), path, 0L)
    val snap = spark.sql(s"CALL graft_sys.system.snapshot('$path')").head()
    snap.getLong(0) shouldBe 1L // version
    snap.getLong(2) shouldBe 150L // n_rows from log stats
    snap.getString(3) shouldBe "grp"
    val hist = spark.sql(s"CALL graft_sys.system.history('$path')")
    hist.select("operation").as[String].collect() shouldBe
      Array("APPEND", "INIT")
    hist.select("rows_added").as[Long].collect() shouldBe Array(50L, 100L)
  }

  test("CALL delete_partitions: metadata-only partition DELETE from SQL") {
    val path = freshPath()
    TxLog.init(rows(0 until 200).repartition(3), path,
      partitionBy = Seq("grp"))
    val res = spark.sql(
      s"CALL graft_sys.system.delete_partitions('$path', 'grp IN (1, 2)')")
      .head()
    res.getLong(0) shouldBe 1L // new version
    res.getLong(1) should be > 0L // files removed
    TxLog.read(spark, path).filter(col("grp").isin(1L, 2L))
      .count() shouldBe 0L
    TxLog.read(spark, path).count() shouldBe
      rows(0 until 200).filter(!col("grp").isin(1L, 2L)).count()
  }

  test("CALL compact + vacuum(dry_run) with named arguments") {
    val path = freshPath()
    TxLog.init(rows(0 until 300).repartition(6), path)
    TxLog.append(rows(300 until 400).repartition(4), path, 0L)
    val before = TxLog.snapshot(path).files.size
    val c = spark.sql(
      s"CALL graft_sys.system.compact(path => '$path')").head()
    c.getLong(0) shouldBe 2L
    c.getLong(1) should be < before.toLong
    // dry_run vacuum REPORTS the superseded files without deleting them
    val dry = spark.sql("CALL graft_sys.system.vacuum(" +
      s"path => '$path', retain_versions => 1, min_age_ms => 0, " +
      "dry_run => true)")
    dry.count() should be > 0L
    TxLog.read(spark, path, asOf = Some(0L)).count() shouldBe 300L // intact
    // real vacuum drops them
    spark.sql("CALL graft_sys.system.vacuum(" +
      s"path => '$path', retain_versions => 1, min_age_ms => 0)")
    intercept[Exception](TxLog.read(spark, path, asOf = Some(0L)))
    TxLog.read(spark, path).count() shouldBe 400L
  }

  test("CALL restore + clone: rollback and zero-copy experiment tables from SQL") {
    val path = freshPath()
    TxLog.init(rows(0 until 100), path)
    TxLog.deleteWhere(spark, path, col("id") < 50L, 0L)
    spark.sql(s"CALL graft_sys.system.restore('$path', 0)")
      .head().getLong(0) shouldBe 2L
    TxLog.read(spark, path).count() shouldBe 100L
    val dst = freshPath()
    val cl = spark.sql(
      s"CALL graft_sys.system.clone('$path', '$dst', version => 1)").head()
    cl.getLong(0) shouldBe 1L
    TxLog.read(spark, dst).count() shouldBe 50L
  }

  test("CALL add_constraint / drop_constraint: CHECK DDL from SQL") {
    val path = freshPath()
    TxLog.init(rows(0 until 50), path)
    spark.sql(s"CALL graft_sys.system.add_constraint('$path', " +
      "'id_nonneg', 'id >= 0')").head().getLong(0) shouldBe 1L
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(Seq((-5L, "bad", 0L)).toDF("id", "payload", "grp"),
        path, 1L)
    }
    spark.sql(s"CALL graft_sys.system.drop_constraint('$path', " +
      "'id_nonneg')").head().getLong(0) shouldBe 2L
    TxLog.append(Seq((-5L, "ok now", 0L)).toDF("id", "payload", "grp"),
      path, 2L)
    TxLog.read(spark, path).count() shouldBe 51L
  }

  test("CALL compact(sort_columns) clusters like OPTIMIZE ZORDER; vacuum takes a reader-floor checkpoint") {
    val path = freshPath()
    TxLog.init(rows(0 until 200).repartition(5), path)
    // a consumer tails the table BEFORE maintenance (a rewrite commit is
    // not streamable, by the append-only contract) — its checkpoint is
    // the reader floor the vacuum below respects
    val work = java.nio.file.Files.createTempDirectory("proc_vac").toString
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 4)
    val q = child.readStream.format("graft-txlog").option("path", path)
      .load().writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val c = spark.sql(s"CALL graft_sys.system.compact(path => '$path', " +
      "target_files => 5, sort_columns => 'grp,id')").head()
    c.getLong(0) shouldBe 1L
    // the OPTIMIZE commit records its clustering key in the audit trail
    TxLog.commitInfos(path).head.params("sortCols") shouldBe "grp,id"
    // clustered: with grp leading the range key over 5 output files,
    // each rewritten file covers a contiguous grp range (1-2 values of
    // the 5), where an unsorted compaction would mix all 5 everywhere
    val perFile = TxLog.read(spark, path)
      .groupBy(input_file_name().as("f"))
      .agg(countDistinct(col("grp")).as("n")).collect()
    perFile.foreach(_.getAs[Long]("n") should be <= 2L)

    // vacuum with the consumer's checkpoint as the reader floor:
    // dry_run reports without dropping, and the floor resolution reads
    // the engine's commits/offsets logs
    val dry = spark.sql("CALL graft_sys.system.vacuum(" +
      s"path => '$path', retain_versions => 1, min_age_ms => 0, " +
      s"dry_run => true, reader_floor_checkpoint => '$work/ckpt')")
    dry.count() should be > 0L // the superseded pre-compaction files
    TxLog.read(spark, path, asOf = Some(0L)).count() shouldBe 200L // intact
  }

  test("unknown procedure and wrong namespace fail loudly") {
    // Spark wraps catalog load failures in FAILED_TO_LOAD_ROUTINE; the
    // named message rides as the cause
    val e = intercept[Exception] {
      spark.sql("CALL graft_sys.system.flurble('/tmp/x')")
    }
    e.getMessage should include("FAILED_TO_LOAD_ROUTINE")
    e.getCause.getMessage should include("unknown graft procedure")
    val e2 = intercept[Exception] {
      spark.sql("CALL graft_sys.nope.compact('/tmp/x')")
    }
    e2.getCause.getMessage should include("'system' namespace")
  }
}
