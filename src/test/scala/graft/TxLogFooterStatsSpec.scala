package graft

import org.apache.spark.sql.functions._

import graft.gold.TxLog

/** Round-16 optimization: per-commit file stats come from the staged
  * files' parquet footers (zero jobs) instead of a second distributed
  * agg. These specs pin EXACT equality of the two paths — same canonical
  * longs, same truncated string bounds, same null counts, same partition
  * values — on the adversarial shapes (astral-plane unicode where UTF-16
  * order disagrees with UTF-8, >32-code-point strings that exercise the
  * truncated-max increment, NULL runs, NULL partitions, NTZ/date
  * partition rendering).
  */
class TxLogFooterStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_footer_stats").toFile
    graft.core.Fs.rmTree(d)
    d.getAbsolutePath
  }

  /** Stats of all files of a snapshot, keyed order-independently (file
    * names are uuid-distinct across the two builds).
    */
  private def statsBag(path: String): Seq[String] = {
    val s = TxLog.snapshot(path)
    s.stats.values.toSeq
      .map(fs => (fs.rows, fs.parts.mkString("|"),
        fs.cols.toSeq.sortBy(_._1).mkString(";")).toString)
      .sorted
  }

  private def buildTable(path: String): Unit = {
    val rows = Seq(
      // (id, s, d, ts, part)
      (1L, "plain ascii", "2020-01-02", "2020-01-02 03:04:05.123456", "a"),
      (2L, null, "2020-03-04", "2021-06-07 00:00:00", "a"),
      (3L, "😀 astral beats ￿ in UTF-16 but not UTF-8",
        "2021-01-01", "2021-01-01 10:00:00.5", "b"),
      (4L, "x" * 40 + "tail-past-the-32-code-point-cap", null,
        "2022-02-02 02:02:02.000001", "b"),
      (5L, "￿ bmp-max first", "1999-12-31", null, null)
    ).toDF("id", "s", "d0", "t0", "p")
      .select(col("id"), col("s"), col("d0").cast("date").as("d"),
        col("t0").cast("timestamp_ntz").as("ts"), col("p"))
    TxLog.init(rows.filter(col("id") <= 3L), path, partitionBy = Seq("p"))
    TxLog.append(rows.filter(col("id") > 3L), path, 0L)
  }

  test("footer-derived stats are exactly the distributed agg's stats") {
    TxLog.statsFooterFallbacks.set(0L)
    val pFooter = tmp()
    buildTable(pFooter)
    TxLog.statsFooterFallbacks.get() shouldBe 0L // footer path really fired
    val pAgg = tmp()
    TxLog.statsFooterDisabled.set(true)
    try buildTable(pAgg)
    finally TxLog.statsFooterDisabled.set(false)
    statsBag(pFooter) shouldBe statsBag(pAgg)
    statsBag(pFooter).nonEmpty shouldBe true
  }

  test("footer stats on NTZ partition values render like CAST AS STRING") {
    TxLog.statsFooterFallbacks.set(0L)
    val rows = Seq(
      (1L, "2020-01-02 03:04:05.120000"),
      (2L, "2020-01-02 03:04:05.120000"),
      (3L, "2021-01-01 00:00:00")
    ).toDF("id", "t0").select(col("id"), col("t0").cast("timestamp_ntz").as("tp"))
    val pFooter = tmp()
    TxLog.init(rows, pFooter, partitionBy = Seq("tp"))
    TxLog.statsFooterFallbacks.get() shouldBe 0L
    val pAgg = tmp()
    TxLog.statsFooterDisabled.set(true)
    try TxLog.init(rows, pAgg, partitionBy = Seq("tp"))
    finally TxLog.statsFooterDisabled.set(false)
    statsBag(pFooter) shouldBe statsBag(pAgg)
    // the trailing-zero-trimmed fraction shape really occurs
    val pvs = TxLog.snapshot(pFooter).stats.values.flatMap(_.parts).flatten.toSet
    pvs should contain("2020-01-02 03:04:05.12")
  }
}
