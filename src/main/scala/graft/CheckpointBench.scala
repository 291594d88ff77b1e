package graft

import graft.gold.TxLog

/** Driver-side log-metadata scalability measurement (round-14 verdict
  * item 3): cold-resolve cost of the two checkpoint kinds vs file count.
  * Synthesizes checkpoints carrying N per-file entries (full column
  * stats, sizes, partition values, a DV entry per 100th file — the
  * realistic worst-ish shape) and times the driver-side parse of each
  * kind. No SparkSession: the parse under test is exactly the code
  * `resolve`/`snapshot` run on a cold read.
  *
  * Usage: `sbt "runMain graft.CheckpointBench [n1,n2,...]"` (default
  * 10000,50000,200000). Results recorded in SCALING.md §round-14.
  */
object CheckpointBench {

  private def syntheticState(n: Int): (Seq[String],
      Map[String, TxLog.FileStats], Map[String, String]) = {
    val files = (0 until n).map(i => f"part-$i%08d-bench-c000.parquet")
    val stats = files.zipWithIndex.map { case (f, i) =>
      f -> TxLog.FileStats(1000L,
        Map(
          "id" -> TxLog.ColStats("l", 0L, Some(i * 1000L), Some(i * 1000L + 999L)),
          "ts" -> TxLog.ColStats("t", 3L, Some(1700000000000000L + i),
            Some(1700000000999999L + i)),
          "name" -> TxLog.ColStats("s", 0L, None, None,
            Some(s"aaaa$i"), Some(s"zzzz$i"))),
        bytes = Some(33554432L),
        parts = Seq(Some((i % 100).toString)))
    }.toMap
    val dvs = files.grouped(100).map(_.head)
      .map(f => f -> s"dv-$f").toMap
    (files, stats, dvs)
  }

  private def timeMs[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10000, 50000, 200000))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    ns.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory("ckptbench").toString
      new java.io.File(dir, TxLog.LogDirName).mkdirs()
      val (files, stats, dvs) = syntheticState(n)
      val (_, wJson) = timeMs(TxLog.writeCheckpointJsonFile(dir, 0L, files,
        Some(schema), Map("app" -> 7L), Map("c" -> "id >= 0"), stats, dvs,
        Seq("name")))
      val (_, wPq) = timeMs(TxLog.writeCheckpointParquet(dir, 0L, files,
        Some(schema), Map("app" -> 7L), Map("c" -> "id >= 0"), stats, dvs,
        Seq("name")))
      val jsonBytes = new java.io.File(dir,
        s"${TxLog.LogDirName}/${"%020d".format(0L)}.checkpoint.json").length()
      val pqBytes = new java.io.File(dir,
        s"${TxLog.LogDirName}/${"%020d".format(0L)}.checkpoint.parquet").length()
      def minRep(reads: => Option[_], reps: Int = 3): Double =
        (0 until reps).map { _ =>
          val (r, ms) = timeMs(reads)
          require(r.isDefined, "checkpoint read failed")
          ms
        }.min
      val rJson = minRep(TxLog.readCheckpointJson(dir, 0L))
      val rPq = minRep(TxLog.readCheckpointParquet(dir, 0L))
      // sanity: both kinds parse to the same state
      val a = TxLog.readCheckpointJson(dir, 0L).get
      val b = TxLog.readCheckpointParquet(dir, 0L).get
      require(a.files.sorted == b.files.sorted && a.stats == b.stats &&
        a.dvs == b.dvs && a.constraints == b.constraints &&
        a.partCols == b.partCols, "kind mismatch")
      println(f"""{"files":$n,"json_bytes":$jsonBytes,"parquet_bytes":$pqBytes,""" +
        f""""json_write_ms":$wJson%.1f,"parquet_write_ms":$wPq%.1f,""" +
        f""""json_read_min_ms":$rJson%.1f,"parquet_read_min_ms":$rPq%.1f}""")
      graft.core.Fs.rmTree(new java.io.File(dir))
    }
  }
}
