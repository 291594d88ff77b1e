package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._

/** The commit log's ACID contract: atomic visibility (readers see only
  * committed versions; orphan data files are invisible), optimistic
  * concurrency (racing writers — one wins, one raises), snapshot
  * isolation / time travel (old versions immutable), and file-level
  * DELETE (only touched files rewritten).
  */
class TxLogSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("txlog").toString + "/t"

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "payload", "grp")

  test("init + append + time travel: versions are immutable snapshots") {
    val path = freshPath()
    val s0 = TxLog.init(rows(0 until 100).repartition(4), path)
    s0.version shouldBe 0L
    TxLog.read(spark, path).count() shouldBe 100L

    val s1 = TxLog.append(rows(100 until 150), path, expectedVersion = 0L)
    s1.version shouldBe 1L
    TxLog.read(spark, path).count() shouldBe 150L
    // time travel: version 0 still serves exactly the original rows
    TxLog.read(spark, path, asOf = Some(0L))
      .agg(sum("id")).as[Long].head() shouldBe (0L until 100L).sum
  }

  test("deleteWhere rewrites only touched files; untouched carry by reference") {
    val path = freshPath()
    // range-clustered: grp-correlated ids so some files have no matches
    TxLog.init(rows(0 until 400).repartitionByRange(8, col("id")), path)
    val before = TxLog.snapshot(path)
    val s1 = TxLog.deleteWhere(spark, path, col("id") < 100L, 0L)
    TxLog.read(spark, path).count() shouldBe 300L
    TxLog.read(spark, path).agg(min("id")).as[Long].head() shouldBe 100L
    // files covering id >= 100 must be the SAME file objects (by name)
    val untouchedKept = before.files.toSet.intersect(s1.files.toSet)
    untouchedKept should not be empty
    // deleted version still time-travels
    TxLog.read(spark, path, asOf = Some(0L)).count() shouldBe 400L
  }

  test("deleteWhere keeps NULL-predicate rows (SQL DELETE semantics) in rewritten files") {
    val path = freshPath()
    // one file holding a true match AND a NULL-evaluating row, one file
    // holding only a NULL-evaluating row (untouched carry-over)
    val data = Seq(
      (1L, java.lang.Long.valueOf(10L)),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "x").repartitionByRange(2, col("id"))
    TxLog.init(data, path)
    TxLog.deleteWhere(spark, path, col("x") > 5L, 0L)
    // only row 1 matched; rows 2 and 3 (x IS NULL → predicate NULL) stay
    TxLog.read(spark, path).select("id").as[Long].collect().sorted shouldBe
      Array(2L, 3L)
  }

  test("optimistic concurrency: second writer on the same version raises") {
    val path = freshPath()
    TxLog.init(rows(0 until 10), path)
    TxLog.append(rows(10 until 20), path, expectedVersion = 0L)
    val e = intercept[TxLog.ConflictException] {
      TxLog.append(rows(20 until 30), path, expectedVersion = 0L)
    }
    e.getMessage should include("another writer")
    // the losing writer's data files are orphans — INVISIBLE to readers
    TxLog.read(spark, path).count() shouldBe 20L
    // retry against the new version succeeds
    TxLog.append(rows(20 until 30), path, expectedVersion = 1L)
    TxLog.read(spark, path).count() shouldBe 30L
  }

  test("a crash between data write and publish leaves the table unchanged") {
    val path = freshPath()
    TxLog.init(rows(0 until 50), path)
    // simulate the crash: drop uncommitted data files into the table dir
    rows(50 until 60).write.mode("overwrite")
      .parquet(path + "_stage")
    new java.io.File(path + "_stage").listFiles()
      .filter(_.getName.startsWith("part-")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(path, "orphan-" + f.getName).toPath)
      }
    // readers resolve the LOG's file list, not the directory listing
    TxLog.read(spark, path).count() shouldBe 50L
  }

  test("vacuum drops orphans and below-horizon files; retained versions still read") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartition(2), path)
    TxLog.append(rows(100 until 120), path, 0L)
    TxLog.deleteWhere(spark, path, col("id") < 50L, 1L) // v2 rewrites files
    // a losing writer's orphan — and a FRESH uncommitted file that the
    // default age horizon would protect
    rows(900 until 910).write.mode("overwrite").parquet(path + "_stage")
    new java.io.File(path + "_stage").listFiles()
      .filter(_.getName.startsWith("part-")).take(1).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(path, "part-orphan.parquet").toPath)
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(path, "part-inflight.parquet").toPath)
      }
    // default horizon: the fresh in-flight file SURVIVES a vacuum
    TxLog.vacuum(path, retainVersions = 3)
      .exists(_.contains("inflight")) shouldBe false
    // minAgeMs=0: this test IS the no-writer-in-flight case; the default
    // 24h horizon exists to protect racing writers' uncommitted files
    val dropped = TxLog.vacuum(path, retainVersions = 2, minAgeMs = 0L)
    dropped should not be empty
    dropped.exists(_.contains("orphan")) shouldBe true
    // retained versions (1, 2) still read exactly
    TxLog.read(spark, path, asOf = Some(1L)).count() shouldBe 120L
    TxLog.read(spark, path).count() shouldBe 70L
    // below the horizon: version 0 is gone
    intercept[Exception](TxLog.read(spark, path, asOf = Some(0L)))
    ()
  }

  test("delete-all publishes an empty version that reads as an error, not garbage") {
    val path = freshPath()
    TxLog.init(rows(0 until 10), path)
    TxLog.deleteWhere(spark, path, lit(true), 0L)
    val e = intercept[IllegalArgumentException] {
      TxLog.read(spark, path)
    }
    e.getMessage should include("no files")
    TxLog.read(spark, path, asOf = Some(0L)).count() shouldBe 10L
  }
}
