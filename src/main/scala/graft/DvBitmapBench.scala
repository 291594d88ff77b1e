package graft

import org.apache.spark.sql.functions._

import graft.gold.TxLog

/** Deletion-vector read-path scalability measurement (round-15, per-file
  * bitmaps): wall time of a full-table aggregate over a DV'd snapshot
  * under the BROADCAST anti-join plan vs the PER-FILE BITMAP filter, as
  * the active deleted-row count grows. The broadcast side ships every
  * deleted (file, row_index) pair into a hashed relation per query; the
  * bitmap side broadcasts only the file→sidecar name map and each
  * executor loads the sidecars it touches once per JVM — the number to
  * watch is the broadcast plan's growth with deleted rows (and its
  * driver/executor memory shape) against the bitmap plan's flatness.
  *
  * Usage: `sbt "runMain graft.DvBitmapBench [rows] [files] [pct1,pct2,..]"`
  * (defaults 4000000 rows, 32 files, 1,5,25 percent deleted). Results in
  * SCALING.md §round-15. Cold = first read in the JVM (bitmap pays the
  * sidecar load), warm = min of 3 repeats (cache hit).
  */
object DvBitmapBench {

  private def timeMs[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val pcts = args.drop(2).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 5, 25))
    val spark = graft.core.GraftSession.builder(appName = "graft-dvbench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try pcts.foreach { pct =>
      val dir = java.nio.file.Files.createTempDirectory("dvbench").toString + "/t"
      val df = spark.range(rows).select(col("id"),
        (col("id") % 997).as("k"), (col("id") * 13 % 1000003).as("v"))
      TxLog.init(df.repartitionByRange(nFiles, col("id")), dir)
      // one DV commit deleting pct% of rows, spread across every file
      TxLog.deleteWhereDV(spark, dir, col("id") % 100 < pct, 0L)
      val deleted = rows * pct / 100
      def agg(): Long = TxLog.read(spark, dir)
        .agg(sum("v"), count(lit(1))).head().getLong(1)
      val expect = rows - deleted
      def measure(threshold: Long): (Double, Double) = {
        val saved = TxLog.dvBitmapMinRows.get()
        TxLog.dvBitmapMinRows.set(threshold)
        try {
          graft.functions.DvSidecars.clearCache()
          val (r0, cold) = timeMs(agg())
          require(r0 == expect, s"row count $r0 != $expect")
          val warm = (0 until 3).map(_ => timeMs(agg())._2).min
          (cold, warm)
        } finally TxLog.dvBitmapMinRows.set(saved)
      }
      val (bCold, bWarm) = measure(Long.MaxValue) // force broadcast
      val (mCold, mWarm) = measure(0L)            // force bitmaps
      println(f"""{"rows":$rows,"files":$nFiles,"deleted":$deleted,""" +
        f""""broadcast_cold_ms":$bCold%.0f,"broadcast_warm_ms":$bWarm%.0f,""" +
        f""""bitmap_cold_ms":$mCold%.0f,"bitmap_warm_ms":$mWarm%.0f}""")
      graft.core.Fs.rmTree(new java.io.File(dir).getParentFile)
    } finally spark.stop()
  }
}
