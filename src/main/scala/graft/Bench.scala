package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are forced through the `noop` sink so the
  * full plan (projections included) executes — `count()` would let Catalyst
  * prune away most of the work and flatter the numbers.
  *
  * Diagnosability (round-3 bench anomaly follow-up): BENCH_FULL.json
  * records BOTH run times per query (min-of-2 hid bimodality), plus JVM GC
  * time and peak heap per run, so a "same code, 14x slower" record can be
  * attributed to GC thrash / host contention from the artifact alone.
  */
object Bench {

  private val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
  private val poolBeans = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    .filter(_.getType == java.lang.management.MemoryType.HEAP)
  private def gcMillis: Long = gcBeans.map(b => math.max(0L, b.getCollectionTime)).sum
  private def resetPeaks(): Unit = poolBeans.foreach(p => scala.util.Try(p.resetPeakUsage()))
  private def peakHeapMb: Long =
    poolBeans.map(p => scala.util.Try(p.getPeakUsage.getUsed).getOrElse(0L)).sum / (1024 * 1024)

  /** One measured execution: (seconds, gcDeltaMillis, peakHeapMb). */
  private case class Run(sec: Double, gcMs: Long, peakMb: Long)

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
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Run = {
      resetPeaks()
      val g0 = gcMillis
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Run((System.nanoTime() - t0) / 1e9, gcMillis - g0, peakHeapMb)
    }
    // min-of-2: the first execution of a query pays codegen + page-cache
    // warmup; the second is the steady-state cost a cluster would see.
    // clearCache between runs: operators that persist() internally must not
    // carry their cache from run 1 into run 2 (that would time a no-op).
    // optional name filter (regex) for focused iteration on one hot query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // optional repeat count (default 2) for isolated-run distributions
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    val results: Seq[(String, Seq[Run])] = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      val runs =
        try {
          (1 to reps).map { _ =>
            val r = once(fn)
            spark.catalog.clearCache()
            r
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Seq(Run(-1.0, 0L, 0L))
        }
      name -> runs
    }
    def f(d: Double): String = "%.4f".format(d)
    val best = results.map { case (k, rs) => k -> rs.map(_.sec).min }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // full per-run diagnostics: every run's wall time, GC delta, peak heap.
    // min-of-N hid bimodality; this makes a slow outlier visible in the
    // artifact itself.
    val runsJson = results.map { case (k, rs) =>
      "\"" + k + "\":{" +
        "\"sec\":[" + rs.map(r => f(r.sec)).mkString(",") + "]," +
        "\"gc_ms\":[" + rs.map(_.gcMs).mkString(",") + "]," +
        "\"peak_heap_mb\":[" + rs.map(_.peakMb).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val failed = best.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total  = best.map(_._2).filter(_ >= 0).sum
    // `*_baseline` queries are deliberately-quadratic ground-truth recall
    // references (each has a bucketed production twin); report them inside
    // `queries` but keep the headline figure for the scale-safe engine.
    val production = best.collect {
      case (k, v) if v >= 0 && !k.endsWith("_baseline") => v
    }.sum
    // EXACT corpus-wide similarity (AllPairs join + the clustering built on
    // it) is priced-for-exactness: on a dense corpus its verification count
    // is information-theoretically bounded below (SCALING.md). Reported as
    // its own line so the LSH-fast engine's cost reads separately.
    val exactSim = Set("q_x_allpairs_jaccard", "q_x_dedup_clusters")
    val exactSimSec = best.collect {
      case (k, v) if v >= 0 && exactSim(k) => v
    }.sum
    val baselineSec = best.collect {
      case (k, v) if v >= 0 && k.endsWith("_baseline") => v
    }.sum
    val env = s""""heap_max_mb":${Runtime.getRuntime.maxMemory / (1024 * 1024)},"cpus":$cpus,"reps":$reps"""
    // `failed` is explicit so a query that starts throwing can never read
    // as a speedup of the headline total.
    val fullLine = s"""{"metric":"total","value":${f(total)},"unit":"sec","production_sec":${f(production)},"baseline_sec":${f(baselineSec)},"exact_similarity_sec":${f(exactSimSec)},"n_failed":${failed.size},"failed":${failed.mkString("[", ",", "]")},$env,"queries":$qs,"runs":$runsJson,"sf":"$sfDir"}"""
    println(fullLine)
    val summary = s"""{"metric":"total","value":${f(total)},"unit":"sec","production_sec":${f(production)},"baseline_sec":${f(baselineSec)},"exact_similarity_sec":${f(exactSimSec)},"n_failed":${failed.size},"n_queries":${best.size},$env,"queries_file":"BENCH_FULL.json","sf":"$sfDir"}"""
    def persist(path: String, line: String): Unit = scala.util.Try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // The harness capturing this output keeps only a bounded stdout TAIL
    // (~2000 chars), which truncates the FRONT of the full line once the
    // per-query map outgrows it — so the headline fields vanished from the
    // parsed record. Persist the full line to a file and re-print a
    // compact summary (no per-query map) LAST so a complete JSON object
    // always survives tail truncation. Round-3 showed even the trailing
    // compact line can go unparsed (sbt appends `[success]` after it), so
    // the summary ALSO goes to stderr and to BENCH_SUMMARY.json — the
    // documented source of truth for headline numbers.
    // only full-suite runs persist the files: a SPARK_GRAFT_ONLY focused
    // run would otherwise clobber the complete per-query record
    if (only.isEmpty) {
      persist("BENCH_FULL.json", fullLine)
      persist("BENCH_SUMMARY.json", summary)
    }
    System.err.println(summary)
    println(summary)
    spark.stop()
  }
}
