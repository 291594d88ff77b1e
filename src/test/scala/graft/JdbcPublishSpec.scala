package graft

import java.io.File

import graft.gold.JdbcPublish

/** The publish contract, warehouse-side: lossless round-trip, idempotent
  * re-publish (delete-then-insert per run key), and incremental
  * composition — a later run's publish never touches earlier runs, and a
  * CORRECTED re-publish of one run replaces exactly that run.
  */
class JdbcPublishSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshUrl(tag: String): String = {
    val db = new File(System.getProperty("java.io.tmpdir"),
      s"graft_publish_spec_$tag.duckdb")
    Seq("", ".wal").foreach(s => new File(db.getPath + s).delete())
    "jdbc:duckdb:" + db.getPath
  }

  private def rows(t: (String, Long, Long)*) =
    t.toDF("run_date", "k", "v")

  private def readSorted(url: String, table: String): Seq[(String, Long, Long)] =
    JdbcPublish.readBack(spark, url, table)
      .select("run_date", "k", "v").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("publish round-trips losslessly and a re-publish does not dupe") {
    val url = freshUrl("roundtrip")
    val batch = rows(("2024-01-01", 1L, 10L), ("2024-01-01", 2L, 20L))
    JdbcPublish.publishIdempotent(batch, url, "t", "run_date")
    JdbcPublish.publishIdempotent(batch, url, "t", "run_date")
    readSorted(url, "t") shouldBe Seq(
      ("2024-01-01", 1L, 10L), ("2024-01-01", 2L, 20L))
  }

  test("runs compose incrementally; a corrected run replaces only itself") {
    val url = freshUrl("incremental")
    JdbcPublish.publishIdempotent(
      rows(("2024-01-01", 1L, 10L)), url, "t", "run_date")
    JdbcPublish.publishIdempotent(
      rows(("2024-01-02", 1L, 99L)), url, "t", "run_date")
    readSorted(url, "t") shouldBe Seq(
      ("2024-01-01", 1L, 10L), ("2024-01-02", 1L, 99L))
    // day-1 correction: different shape (2 rows) and values — day 2 intact
    JdbcPublish.publishIdempotent(
      rows(("2024-01-01", 1L, 11L), ("2024-01-01", 2L, 12L)),
      url, "t", "run_date")
    readSorted(url, "t") shouldBe Seq(
      ("2024-01-01", 1L, 11L), ("2024-01-01", 2L, 12L),
      ("2024-01-02", 1L, 99L))
  }

  test("a mixed-run batch deletes exactly the run keys it carries") {
    val url = freshUrl("mixed")
    JdbcPublish.publishIdempotent(
      rows(("d1", 1L, 1L), ("d2", 2L, 2L), ("d3", 3L, 3L)),
      url, "t", "run_date")
    JdbcPublish.publishIdempotent(
      rows(("d1", 1L, 100L), ("d3", 3L, 300L)), url, "t", "run_date")
    readSorted(url, "t") shouldBe Seq(
      ("d1", 1L, 100L), ("d2", 2L, 2L), ("d3", 3L, 300L))
  }
}
