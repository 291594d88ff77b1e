package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._

/** The declarative exactly-once sink (`writeStream.format("graft-txlog")`,
  * [[graft.streaming.TxLogSink]]): every micro-batch commits through
  * `appendIfNew` under `commitWithRetry`, so the engine's at-least-once
  * batch redelivery applies nothing twice. The crash-window test drives a
  * REAL restart-redelivery: the sink's fault injection kills the query
  * after the TABLE commit of a chosen batch but before the ENGINE commit
  * marker — the restart must redeliver exactly that batch and the txn
  * watermark must no-op it.
  */
class TxLogSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDir(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "payload")

  /** Stage `nFiles` one-per-micro-batch parquet files under `stage`. */
  private def stageFiles(stage: String, n: Int, nFiles: Int): Unit =
    (0 until nFiles).foreach { f =>
      rows(f * n / nFiles until (f + 1) * n / nFiles)
        .coalesce(1).write.mode("append").parquet(stage)
    }

  private def runSink(stage: String, table: String, ckpt: String,
      appId: String, fault: Option[Long] = None): Option[Throwable] = {
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 4)
    var w = child.readStream.schema(rows(0 until 1).schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .writeStream.format("graft-txlog")
      .option("path", table).option("appId", appId)
      .option("checkpointLocation", ckpt)
    fault.foreach(k =>
      w = w.option(graft.streaming.TxLogSink.FaultInjectKey, k.toString))
    val q = w.start()
    try { q.processAllAvailable(); None }
    catch { case scala.util.control.NonFatal(e) => Some(e) }
    finally q.stop()
  }

  test("format sink: one ACID commit per micro-batch, result == batch input, history attributed") {
    val work = freshDir("txsink")
    val stage = s"$work/stage"; val table = s"$work/t"; val ckpt = s"$work/ckpt"
    stageFiles(stage, 60, 4)
    TxLog.init(rows(0 until 0), table)
    runSink(stage, table, ckpt, appId = "spec-app") shouldBe None
    TxLog.read(spark, table).select("id").as[Long].collect().sorted shouldBe
      (0L until 60L).toArray
    // 4 micro-batches → versions 1..4, each attributed to the sink app
    val infos = TxLog.commitInfos(table)
    infos.map(_.version) shouldBe Seq(4L, 3L, 2L, 1L, 0L)
    infos.init.foreach { ci =>
      ci.operation shouldBe Some("STREAMING_APPEND")
      ci.params("appId") shouldBe "spec-app"
    }
    infos.init.map(_.params("batchId")) shouldBe Seq("3", "2", "1", "0")
    // a second identical run over the SAME checkpoint redelivers nothing
    runSink(stage, table, ckpt, appId = "spec-app") shouldBe None
    TxLog.read(spark, table).count() shouldBe 60L
  }

  test("crash window: table commit lands, engine commit does not; restart redelivers as a NO-OP") {
    val work = freshDir("txsink")
    val stage = s"$work/stage"; val table = s"$work/t"; val ckpt = s"$work/ckpt"
    stageFiles(stage, 60, 4)
    TxLog.init(rows(0 until 0), table)
    val err = runSink(stage, table, ckpt, "spec-app", fault = Some(2L))
    err.map(_.getMessage).getOrElse("") should include("INJECTED failure")
    // the crashed batch's TABLE commit is in: batches 0..2 = 45 rows
    TxLog.read(spark, table).count() shouldBe 45L
    TxLog.snapshot(table).txns("spec-app") shouldBe 2L
    // restart: batch 2 is REDELIVERED (its engine marker never landed) and
    // must no-op; batch 3 then applies
    runSink(stage, table, ckpt, "spec-app") shouldBe None
    TxLog.read(spark, table).select("id").as[Long].collect().sorted shouldBe
      (0L until 60L).toArray
    TxLog.snapshot(table).txns("spec-app") shouldBe 3L
  }

  test("randomized crash points: any batch's crash window recovers exactly-once") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L)
      val nFiles = 3 + rnd.nextInt(3) // 3..5 micro-batches
      val crashAt = rnd.nextInt(nFiles).toLong // any batch, first included
      val n = nFiles * 12
      val work = freshDir("txsink_rnd")
      val stage = s"$work/stage"; val table = s"$work/t"; val ckpt = s"$work/ckpt"
      stageFiles(stage, n, nFiles)
      TxLog.init(rows(0 until 0), table)
      withClue(s"seed=$seed nFiles=$nFiles crashAt=$crashAt: ") {
        val err = runSink(stage, table, ckpt, "rnd-app", fault = Some(crashAt))
        err.map(_.getMessage).getOrElse("") should include("INJECTED failure")
        runSink(stage, table, ckpt, "rnd-app") shouldBe None
        TxLog.read(spark, table).select("id").as[Long].collect().sorted shouldBe
          (0L until n.toLong).toArray
        TxLog.snapshot(table).txns("rnd-app") shouldBe (nFiles - 1).toLong
      }
    }
  }

  test("sink refuses: non-append mode, missing appId, missing table, partitionBy") {
    val work = freshDir("txsink")
    val stage = s"$work/stage"; val table = s"$work/t"
    stageFiles(stage, 10, 1)
    TxLog.init(rows(0 until 0), table)
    val child = spark.newSession()
    var nCkpt = 0
    def writer() = {
      nCkpt += 1
      child.readStream.schema(rows(0 until 1).schema)
        .parquet(stage).writeStream.format("graft-txlog")
        .option("checkpointLocation", s"$work/ckpt_$nCkpt")
    }
    val modeErr = intercept[Exception] {
      writer().option("path", table).option("appId", "a")
        .outputMode("update").start()
    }
    modeErr.getMessage should include("only Append output mode")
    val appErr = intercept[Exception] {
      writer().option("path", table).start()
    }
    appErr.getMessage should include("'appId' option is required")
    val tblErr = intercept[Exception] {
      writer().option("path", s"$work/nope").option("appId", "a").start()
    }
    tblErr.getMessage should include("no TxLog table")
    val partErr = intercept[Exception] {
      writer().option("path", table).option("appId", "a")
        .partitionBy("payload").start()
    }
    partErr.getMessage should include(
      "partitionBy clause is not supported")
  }
}
