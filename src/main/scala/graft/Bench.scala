package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are forced through the `noop` sink so the
  * full plan (projections included) executes — `count()` would let Catalyst
  * prune away most of the work and flatter the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-bench",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: pay JVM/classloader/codegen startup once, not inside the
    // first measured query (it was otherwise charged ~6s of warmup). A
    // broken sfDir must degrade to per-query -1.0 results, not abort the
    // whole bench before any output.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      core.Tables(spark, sfDir).lineitem.limit(1000)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-2: the first execution of a query pays codegen + page-cache
    // warmup; the second is the steady-state cost a cluster would see.
    // clearCache between runs: operators that persist() internally must not
    // carry their cache from run 1 into run 2 (that would time a no-op).
    // optional name filter (regex) for focused iteration on one hot query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      val t =
        try {
          val t1 = once(fn)
          spark.catalog.clearCache()
          val t2 = once(fn)
          spark.catalog.clearCache()
          math.min(t1, t2)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total  = results.map(_._2).filter(_ >= 0).sum
    // `*_baseline` queries are deliberately-quadratic ground-truth recall
    // references (each has a bucketed production twin); report them inside
    // `queries` but keep the headline figure for the scale-safe engine.
    val production = results.collect {
      case (k, v) if v >= 0 && !k.endsWith("_baseline") => v
    }.sum
    // EXACT corpus-wide similarity (AllPairs join + the clustering built on
    // it) is priced-for-exactness: on a dense corpus its verification count
    // is information-theoretically bounded below (SCALING.md). Reported as
    // its own line so the LSH-fast engine's cost reads separately.
    val exactSim = Set("q_x_allpairs_jaccard", "q_x_dedup_clusters")
    val exactSimSec = results.collect {
      case (k, v) if v >= 0 && exactSim(k) => v
    }.sum
    val baselineSec = results.collect {
      case (k, v) if v >= 0 && k.endsWith("_baseline") => v
    }.sum
    // `failed` is explicit so a query that starts throwing can never read
    // as a speedup of the headline total.
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","production_sec":$production,"baseline_sec":$baselineSec,"exact_similarity_sec":$exactSimSec,"n_failed":${failed.size},"failed":${failed.mkString("[", ",", "]")},"queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // The harness capturing this output keeps only a bounded stdout TAIL
    // (~2000 chars), which truncates the FRONT of the full line once the
    // per-query map outgrows it — so the headline fields vanished from the
    // parsed record. Persist the full line to a file and re-print a
    // compact summary (no per-query map) LAST so a complete JSON object
    // always survives tail truncation.
    // only full-suite runs persist the file: a SPARK_GRAFT_ONLY focused
    // run would otherwise clobber the complete per-query record
    if (only.isEmpty) scala.util.Try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","production_sec":$production,"baseline_sec":$baselineSec,"exact_similarity_sec":$exactSimSec,"n_failed":${failed.size},"n_queries":${results.size},"queries_file":"BENCH_FULL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
