package graft

import graft.gold.TxLog
import graft.gold.TxLog.{MergeBySource, MergeMatched, MergeNotMatched}
import org.apache.spark.sql.functions._

/** Full-shape MERGE semantics (`TxLog.mergeDV`): conditional and multiple
  * WHEN MATCHED clauses with first-match-wins, conditional NOT MATCHED
  * inserts, NOT MATCHED BY SOURCE update/delete — all as one row-level DV
  * commit. Contract points: per-ROW clause selection (two same-key target
  * rows can take different branches — the key-level upsert cannot),
  * equivalence with the proven unconditional path, CDF foldability,
  * constraint gating, and the Delta cardinality refusal.
  */
class TxLogMergeDvSpec extends SparkSpecBase {
  import spark.implicits._

  private val T = TxLog.MergeTargetAlias
  private val S = TxLog.MergeSourceAlias

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("txmrg").toString + "/t"

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i", (i % 7).toLong * 10L))
      .toDF("id", "payload", "cents")

  private def byId(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
    df.select("id", "payload", "cents").as[(Long, String, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq

  test("conditional matched clauses: first-match-wins per ROW vs a " +
      "driver-side model; CDF folds the commit; no file churn") {
    val path = freshPath()
    TxLog.init(rows(0 until 200).repartitionByRange(4, col("id")), path)
    val filesBefore = TxLog.snapshot(path).files.toSet
    // source: ids 150..249 with a delta column (50 matched, 50 unmatched)
    val src = (150 until 250).map(i => (i.toLong, (i % 3).toLong - 1L))
      .toDF("sid", "delta")
    TxLog.mergeDV(spark, path, src, Seq("id" -> "sid"),
      matched = Seq(
        // clause 0: negative delta kills the row
        MergeMatched(Some(col(s"$S.delta") < 0L), None),
        // clause 1: high cents bump by delta
        MergeMatched(Some(col(s"$T.cents") >= 40L),
          Some(Map("cents" -> (col(s"$T.cents") + col(s"$S.delta"))))),
        // clause 2 (unconditional tail): tag the payload
        MergeMatched(None, Some(Map("payload" -> lit("touched"))))),
      notMatched = Seq(
        // only even unmatched ids insert
        MergeNotMatched(Some(col(s"$S.sid") % 2 === 0L),
          Map("id" -> col(s"$S.sid"), "payload" -> lit("new"),
            "cents" -> col(s"$S.delta")))),
      expectedVersion = 0L)
    // driver-side model of the same semantics
    val deltas = (150 until 250).map(i => i.toLong -> ((i % 3).toLong - 1L)).toMap
    val model = (0 until 200).flatMap { i =>
      val id = i.toLong; val cents = (i % 7).toLong * 10L
      deltas.get(id) match {
        case None => Some((id, s"v$i", cents))
        case Some(d) if d < 0L => None
        case Some(d) if cents >= 40L => Some((id, s"v$i", cents + d))
        case Some(_) => Some((id, "touched", cents))
      }
    } ++ (200 until 250).collect {
      case i if i % 2 == 0 => (i.toLong, "new", deltas(i.toLong))
    }
    byId(TxLog.read(spark, path)) shouldBe
      model.sortBy(r => (r._1, r._2, r._3))
    // soft mechanics: nothing removed, only appends + one sidecar
    filesBefore.subsetOf(TxLog.snapshot(path).files.toSet) shouldBe true
    TxLog.snapshot(path).dvs should not be empty
    // the change feed reconstructs the merged table exactly
    byId(TxLog.mirrorFromChanges(spark, path)) shouldBe
      byId(TxLog.read(spark, path))
  }

  test("row-level precision: two same-key target rows take DIFFERENT " +
      "clause branches (the key-level upsert cannot express this)") {
    val path = freshPath()
    Seq((1L, "a", 10L), (1L, "b", 99L), (2L, "c", 5L))
      .toDF("id", "payload", "cents").repartition(1)
      .write.parquet(freshPath().stripSuffix("/t") + "/stage0")
    val stage = Seq((1L, "a", 10L), (1L, "b", 99L), (2L, "c", 5L))
      .toDF("id", "payload", "cents")
    TxLog.init(stage.repartition(1), path)
    val src = Seq((1L, 0L)).toDF("sid", "x")
    TxLog.mergeDV(spark, path, src, Seq("id" -> "sid"),
      matched = Seq(
        MergeMatched(Some(col(s"$T.cents") > 50L), None), // kill the high one
        MergeMatched(None, Some(Map("payload" -> lit("kept"))))),
      expectedVersion = 0L)
    byId(TxLog.read(spark, path)) shouldBe
      Seq((1L, "kept", 10L), (2L, "c", 5L))
  }

  test("NOT MATCHED BY SOURCE: conditional update + delete over orphan " +
      "target rows; matched/insert sides untouched") {
    val path = freshPath()
    TxLog.init(rows(0 until 100).repartitionByRange(2, col("id")), path)
    val src = (40 until 60).map(i => (i.toLong, 1L)).toDF("sid", "x")
    TxLog.mergeDV(spark, path, src, Seq("id" -> "sid"),
      matched = Seq(MergeMatched(None, Some(Map("payload" -> lit("m"))))),
      bySource = Seq(
        MergeBySource(Some(col(s"$T.id") < 10L), None), // orphans below 10 die
        MergeBySource(Some(col(s"$T.cents") === 0L),
          Some(Map("payload" -> lit("orphan0"))))),
      expectedVersion = 0L)
    val model = (0 until 100).flatMap { i =>
      val id = i.toLong; val cents = (i % 7).toLong * 10L
      if (id >= 40 && id < 60) Some((id, "m", cents))
      else if (id < 10) None
      else if (cents == 0L) Some((id, "orphan0", cents))
      else Some((id, s"v$i", cents))
    }
    byId(TxLog.read(spark, path)) shouldBe
      model.sortBy(r => (r._1, r._2, r._3))
    byId(TxLog.mirrorFromChanges(spark, path)) shouldBe
      byId(TxLog.read(spark, path))
  }

  test("unconditional upsert through mergeDV == the proven " +
      "replaceWhereKeysDV twin; empty table degenerates to insert-only") {
    val a = freshPath(); val b = freshPath()
    TxLog.init(rows(0 until 150).repartitionByRange(3, col("id")), a)
    TxLog.init(rows(0 until 150).repartitionByRange(3, col("id")), b)
    val src = (100 until 180).map(i => (i.toLong, s"u$i", 999L))
      .toDF("id", "payload", "cents")
    TxLog.mergeDV(spark, a, src, Seq("id" -> "id"),
      matched = Seq(MergeMatched(None, Some(Map(
        "payload" -> col(s"$S.payload"), "cents" -> col(s"$S.cents"))))),
      notMatched = Seq(MergeNotMatched(None, Map(
        "id" -> col(s"$S.id"), "payload" -> col(s"$S.payload"),
        "cents" -> col(s"$S.cents")))),
      expectedVersion = 0L)
    // twin: the existing keyed path (update images = join, inserts = anti)
    val tgt = TxLog.read(spark, b)
    val newData = src
    TxLog.replaceWhereKeysDV(spark, b, src.select("id"), Seq("id"),
      newData, 0L)
    byId(TxLog.read(spark, a)) shouldBe byId(TxLog.read(spark, b))
    val _ = tgt
    // empty table: inserts only, conditional clause still filters
    val c = freshPath()
    TxLog.init(rows(0 until 10).limit(0), c)
    TxLog.mergeDV(spark, c, src, Seq("id" -> "id"),
      notMatched = Seq(MergeNotMatched(Some(col(s"$S.id") % 2 === 0L),
        Map("id" -> col(s"$S.id"), "payload" -> col(s"$S.payload"),
          "cents" -> col(s"$S.cents")))),
      expectedVersion = 0L)
    TxLog.read(spark, c).count() shouldBe (100 until 180).count(_ % 2 == 0)
  }

  test("refusals: cardinality, unknown assignment column, no clauses; " +
      "constraints gate the new images atomically") {
    val path = freshPath()
    TxLog.init(rows(0 until 50).repartition(2), path)
    // duplicate source keys matching rows + a matched clause: refuse
    val dup = Seq((5L, 1L), (5L, 2L)).toDF("sid", "x")
    intercept[IllegalArgumentException] {
      TxLog.mergeDV(spark, path, dup, Seq("id" -> "sid"),
        matched = Seq(MergeMatched(None, None)), expectedVersion = 0L)
    }.getMessage should include("cardinality")
    // duplicate keys that only INSERT are legal (both rows insert)
    val dupNew = Seq((900L, 1L), (900L, 2L)).toDF("sid", "x")
    TxLog.mergeDV(spark, path, dupNew, Seq("id" -> "sid"),
      matched = Seq(MergeMatched(None, None)),
      notMatched = Seq(MergeNotMatched(None, Map(
        "id" -> col(s"$S.sid"), "payload" -> lit("d"),
        "cents" -> col(s"$S.x")))),
      expectedVersion = 0L)
    TxLog.read(spark, path).filter(col("id") === 900L).count() shouldBe 2L
    // unknown assignment target
    intercept[IllegalArgumentException] {
      TxLog.mergeDV(spark, path, dupNew, Seq("id" -> "sid"),
        matched = Seq(MergeMatched(None, Some(Map("ghost" -> lit(1L))))),
        expectedVersion = 1L)
    }.getMessage should include("ghost")
    // no clauses at all
    intercept[IllegalArgumentException] {
      TxLog.mergeDV(spark, path, dupNew, Seq("id" -> "sid"),
        expectedVersion = 1L)
    }.getMessage should include("no merge clauses")
    // constraint violation in an UPDATE image refuses atomically
    val v = TxLog.addConstraint(spark, path, "cents_small",
      "cents < 10000", 1L).version
    val before = byId(TxLog.read(spark, path))
    intercept[Exception] {
      TxLog.mergeDV(spark, path, Seq((1L, 1L)).toDF("sid", "x"),
        Seq("id" -> "sid"),
        matched = Seq(MergeMatched(None,
          Some(Map("cents" -> lit(999999L))))),
        expectedVersion = v)
    }
    byId(TxLog.read(spark, path)) shouldBe before
    TxLog.currentVersion(path) shouldBe Some(v)
  }
}
