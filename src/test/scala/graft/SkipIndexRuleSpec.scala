package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.RewriteSkipIndexScan

/** The automatic data-skipping rule's contract: (1) pruning actually
  * happens — the executed scan reads strictly fewer files; (2) pruning is
  * SOUND — pruned result ≡ unpruned result for every predicate shape the
  * rule understands and for ones it must ignore; (3) the conf is loud on
  * misconfiguration and scoped per session; (4) a rebuilt index
  * invalidates the driver-side stats cache.
  */
class SkipIndexRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private def scanFileCounts(df: DataFrame): Seq[Int] = {
    df.collect() // force final (AQE-resolved) plan
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.relation.location.inputFiles.length
    }.toSeq
  }

  private def writeTable(path: String): Unit = {
    // k runs 0..799 range-clustered into 8 files of ~tight [k] ranges
    (0 until 800).map(i => (i.toLong, i % 7, s"r$i"))
      .toDF("k", "grp", "payload")
      .repartitionByRange(8, col("k"))
      .write.mode("overwrite").parquet(path)
    gold.StatsIndex.write(spark, path, Seq("k"))
  }

  test("rule prunes the scan and stays oracle-identical across predicate shapes") {
    val path = java.nio.file.Files.createTempDirectory("skipidx").toString + "/t"
    writeTable(path)
    val s = spark.newSession()
    s.conf.set(RewriteSkipIndexScan.PathKey, path)

    val predicates: Seq[(DataFrame => DataFrame, Boolean)] = Seq(
      // (predicate, expectPrune)
      ((d: DataFrame) => d.filter(col("k") >= 100L && col("k") <= 199L), true),
      ((d: DataFrame) => d.filter(col("k") === 250L), true),
      ((d: DataFrame) => d.filter(col("k") > 700L), true),
      ((d: DataFrame) => d.filter(lit(650L) <= col("k")), true), // reversed operands
      ((d: DataFrame) => d.filter(col("k") < 90L && col("grp") === 3), true), // mixed conjuncts
      ((d: DataFrame) => d.filter(col("grp") === 3), false) // un-indexed only: no prune
    )
    for (((pred, expectPrune), i) <- predicates.zipWithIndex) {
      val pruned = pred(s.read.parquet(path))
      val full = pred(spark.read.parquet(path)) // parent session: rule unarmed
      withClue(s"predicate #$i: ") {
        pruned.collect().map(_.toSeq).sortBy(_.mkString("|")) shouldBe
          full.collect().map(_.toSeq).sortBy(_.mkString("|"))
        val counts = scanFileCounts(pruned)
        if (expectPrune) counts.foreach(_ should be < 8)
        else counts.foreach(_ shouldBe 8)
        // the unarmed parent session never prunes (conf scoping)
        scanFileCounts(full).foreach(_ shouldBe 8)
      }
    }
    // an impossible interval prunes to zero files, result empty
    val none = s.read.parquet(path).filter(col("k") > 5000L)
    none.collect() shouldBe empty
    scanFileCounts(none).foreach(_ shouldBe 0)
  }

  test("date, string, and timestamp_ntz predicates prune and stay sound") {
    val path = java.nio.file.Files.createTempDirectory("skipidx-dt")
      .toString + "/t"
    // 400 days from 2020-01-01, clustered by date into 8 files; s runs
    // s000..s399 (lexicographic == numeric here); ts tracks d at noon
    (0 until 400).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        f"s$i%03d",
        java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2020, 1, 1).plusDays(i).atTime(12, 0)),
        i.toLong)
    }.toDF("d", "s", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .repartitionByRange(8, col("d"))
      .write.mode("overwrite").parquet(path)
    gold.StatsIndex.write(spark, path, Seq("d", "s", "ts"))
    val s = spark.newSession()
    s.conf.set(RewriteSkipIndexScan.PathKey, path)
    val predicates: Seq[DataFrame => DataFrame] = Seq(
      d => d.filter(col("d") >= lit("2020-02-01").cast("date") &&
        col("d") < lit("2020-03-01").cast("date")),
      d => d.filter(col("s") === "s123"),
      d => d.filter(col("s") >= "s350"),
      d => d.filter(col("ts") < lit("2020-01-15 00:00:00").cast("timestamp_ntz"))
    )
    for ((pred, i) <- predicates.zipWithIndex) {
      val pruned = pred(s.read.parquet(path))
      val full = pred(spark.read.parquet(path))
      withClue(s"predicate #$i: ") {
        pruned.collect().map(_.toSeq).sortBy(_.mkString("|")) shouldBe
          full.collect().map(_.toSeq).sortBy(_.mkString("|"))
        scanFileCounts(pruned).foreach(_ should be < 8)
        scanFileCounts(full).foreach(_ shouldBe 8)
      }
    }
  }

  test("a rebuilt index invalidates the stats cache") {
    val path = java.nio.file.Files.createTempDirectory("skipidx2").toString + "/t"
    writeTable(path)
    val s = spark.newSession()
    s.conf.set(RewriteSkipIndexScan.PathKey, path)
    scanFileCounts(
      s.read.parquet(path).filter(col("k") <= 99L)).foreach(_ should be < 8)
    // rewrite: same key space but 2 files — stale stats would prune wrong
    (0 until 800).map(i => (i.toLong, i % 7, s"r$i"))
      .toDF("k", "grp", "payload")
      .repartitionByRange(2, col("k"))
      .write.mode("overwrite").parquet(path)
    gold.StatsIndex.write(spark, path, Seq("k"))
    val after = s.read.parquet(path).filter(col("k") <= 99L)
    after.select(sum(col("k"))).as[Long].collect().head shouldBe (0L to 99L).sum
    scanFileCounts(after).foreach(_ shouldBe 1)
  }

  test("conf set without an index raises a named error") {
    val path = java.nio.file.Files.createTempDirectory("skipidx3").toString + "/t"
    (0 until 10).map(i => (i.toLong, s"r$i")).toDF("k", "payload")
      .write.mode("overwrite").parquet(path)
    val s = spark.newSession()
    s.conf.set(RewriteSkipIndexScan.PathKey, path)
    val e = intercept[Exception] {
      s.read.parquet(path).filter(col("k") === 1L).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).toSeq
    chain.exists(c => c.getMessage != null &&
      c.getMessage.contains(RewriteSkipIndexScan.PathKey)) shouldBe true
  }
}
