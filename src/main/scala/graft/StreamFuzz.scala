package graft

/** Streaming-replay differential fuzz main: N seeded random scenarios
  * (see `fuzz.StreamFuzzer`) run through the REAL streaming replay
  * harnesses and diffed exactly against in-process DuckDB batch twins.
  *
  * Usage: `StreamFuzz [n] [startSeed]` — prints one line per failure and
  * a final JSON summary line. Exit 1 on any mismatch. Reproduce a single
  * failure with `startSeed = <failing seed>`, `n = 1`.
  */
object StreamFuzz {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100)
    val start = args.lift(1).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-streamfuzz",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_streamfuzz").toString
    val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    var passed = 0; var failed = 0
    var lateScenarios = 0; var lateRows = 0L
    val LateRe = "/late=(\\d+)".r
    val modes = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    try {
      (start until start + n).foreach { seed =>
        val o = fuzz.StreamFuzzer.run(spark, con, tmpRoot, seed)
        modes(o.desc.takeWhile(_ != '/')) += 1
        LateRe.findFirstMatchIn(o.desc).map(_.group(1).toLong).foreach { k =>
          if (k > 0) { lateScenarios += 1; lateRows += k }
        }
        if (o.ok) passed += 1
        else {
          failed += 1
          System.err.println(s"[streamfuzz] FAIL seed=$seed ${o.desc}: ${o.error.get}")
        }
        if ((seed - start + 1) % 20 == 0)
          System.err.println(s"[streamfuzz] ${seed - start + 1}/$n done, $failed failed")
      }
    } finally {
      con.close()
      graft.core.Fs.rmTree(new java.io.File(tmpRoot))
    }
    println(runner.Reports.toJson(Map(
      "stream_fuzz_total" -> n.toString, "passed" -> passed.toString,
      "failed" -> failed.toString, "start_seed" -> start.toString,
      "late_scenarios" -> lateScenarios.toString,
      "late_rows" -> lateRows.toString,
      "modes" -> modes.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }
        .mkString(","))))
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
