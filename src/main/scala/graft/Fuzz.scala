package graft

/** Differential fuzz harness main: N seeded random queries (see
  * `fuzz.QueryFuzzer` for the grammar) executed on Spark AND in-process
  * DuckDB over the same parquet, row sets diffed exactly.
  *
  * Usage: `Fuzz <sfDir> [n] [startSeed]` — prints one line per failure
  * (seed + shape + first differing row + the SQL twin for replay) and a
  * final JSON summary line. Exit 1 on any mismatch. Reproduce a single
  * failure by re-running with `startSeed = <failing seed>` and `n = 1`.
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.error("usage: Fuzz <sfDir> [n] [startSeed]"))
    val n = args.lift(1).map(_.toInt).getOrElse(500)
    val start = args.lift(2).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-fuzz",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val con = fuzz.DiffRunner.openOracle(sfDir)
    var passed = 0; var failed = 0; var empty = 0
    val shapes = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    try {
      (start until start + n).foreach { seed =>
        val q = fuzz.QueryFuzzer.generate(seed)
        val o = fuzz.DiffRunner.run(spark, sfDir, con, q)
        shapes(o.desc.takeWhile(_ != '/')) += 1
        if (o.ok) {
          passed += 1
          if (o.sparkRows == 0) empty += 1
        } else {
          failed += 1
          System.err.println(s"[fuzz] FAIL seed=$seed ${o.desc}: ${o.error.get}")
          System.err.println(s"[fuzz]   sql: ${q.sql}")
        }
        if ((seed - start + 1) % 50 == 0)
          System.err.println(s"[fuzz] ${seed - start + 1}/$n done, $failed failed")
      }
    } finally con.close()
    println(runner.Reports.toJson(Map(
      "fuzz_total" -> n.toString, "passed" -> passed.toString,
      "failed" -> failed.toString, "empty_results" -> empty.toString,
      "start_seed" -> start.toString,
      "shapes" -> shapes.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }
        .mkString(","))))
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
