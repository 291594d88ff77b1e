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
  *
  * JVM SEGMENTATION (round-6, SCALING.md §round-6-re-measure): a full
  * suite is split into `SPARK_GRAFT_SEGMENTS` (default 3) contiguous
  * name-ordered chunks, each run in its OWN child JVM — one JVM's JIT
  * dice-roll (deopt/recompile churn of a hot generated class) can inflate
  * cpu 5–25x with zero functional signal, and a single long-lived JVM let
  * that contaminate a whole round's record. Children inherit this JVM's
  * full argument list and classpath, report per-run TSV fragments, and
  * the parent merges them into the exact artifacts a single-JVM run
  * produces. `SPARK_GRAFT_SEGMENTS=1` restores the single-JVM path;
  * focused `SPARK_GRAFT_ONLY` runs are never segmented.
  */
object Bench {

  private val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
  private val poolBeans = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    .filter(_.getType == java.lang.management.MemoryType.HEAP)
  private def gcMillis: Long = gcBeans.map(b => math.max(0L, b.getCollectionTime)).sum
  private def resetPeaks(): Unit = poolBeans.foreach(p => scala.util.Try(p.resetPeakUsage()))
  private def peakHeapMb: Long =
    poolBeans.map(p => scala.util.Try(p.getPeakUsage.getUsed).getOrElse(0L)).sum / (1024 * 1024)

  /** One measured execution: wall seconds, GC delta, peak heap, and summed
    * executor-task CPU time. CPU time is CONTENTION-IMMUNE: on a host
    * where other tenants steal cycles, wall time inflates but on-CPU time
    * does not — so wall ≫ cpu across reps of identical code attributes a
    * slow rep to the host, from the artifact alone.
    */
  private case class Run(sec: Double, gcMs: Long, peakMb: Long, cpuMs: Long)

  /** Sums executor CPU nanos across all task-end events (async bus —
    * readers must drain via ListenerBridge before reading).
    */
  private class CpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  // Locale.ROOT: a comma-decimal default locale would emit '1,2345' and
  // corrupt every JSON/TSV artifact this main produces
  private def f(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)

  private def envInt(key: String, default: Int): Int =
    sys.env.get(key).flatMap(v => scala.util.Try(v.trim.toInt).toOption match {
      case None =>
        System.err.println(s"[bench] ignoring non-numeric $key='${v}'")
        None
      case ok => ok
    }).getOrElse(default)

  /** Measure `selected` queries in THIS JVM: session + warmup + the
    * per-rep loop. Returns per-query runs plus the watchdog's
    * interpreted-kernel error count.
    */
  private def runQueries(sfDir: String,
      selected: Seq[String], reps: Int): (Seq[(String, Seq[Run])], Int) = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val cpu = new CpuListener
    spark.sparkContext.addSparkListener(cpu)
    // Interpreted-fallback watchdog: a graft kernel silently dropping out
    // of codegen is a 10-25x slowdown with no functional signal — exactly
    // the round-5 driver-bench anomaly. Every executed plan is audited and
    // error findings are counted into the bench artifact itself.
    val watchdog = plans.CodegenAudit.attach(spark)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Run = {
      resetPeaks()
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val c0 = cpu.cpuNs.get()
      val g0 = gcMillis
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      Run(sec, gcMillis - g0, peakHeapMb, (cpu.cpuNs.get() - c0) / 1000000L)
    }
    // min-of-reps: the first execution of a query pays codegen + page-cache
    // warmup; later reps are the steady-state cost a cluster would see.
    // clearCache between runs: operators that persist() internally must not
    // carry their cache from run 1 into run 2 (that would time a no-op).
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected.contains(name) }
      .map { case (name, fn) =>
      watchdog.current.set(name)
      // per-REP failure isolation: rep k failing must not discard the k-1
      // completed runs (they ARE the distribution data for flaky queries);
      // a query is failed only when no rep succeeded
      val runs = (1 to reps).flatMap { i =>
        try {
          val r = once(fn)
          spark.catalog.clearCache()
          Some(r)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name rep $i failed: ${e.getMessage}")
          None
        }
      }
      name -> (if (runs.nonEmpty) runs else Seq(Run(-1.0, 0L, 0L, 0L)))
    }
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    val errs = watchdog.errors.get()
    spark.stop()
    (results, errs)
  }

  /** Queries that are intrinsically expensive (20+ GB peak heaps, heavy
    * codegen churn, long stateful streams). Round-7 lesson: letting one of
    * these share a name-ordered segment inflated its NEIGHBORS' cpu_ms
    * 6-13x — the committed record stopped being attributable to the
    * queries it named. Each runs in its OWN child JVM so the per-query
    * numbers are isolated by construction, not by post-hoc re-runs.
    */
  private val heavyQueries = Seq(
    "q_o_triangle_count", "q_o_stream_join_replay",
    "q_o_stream_late_replay", "q_o_stream_append_replay",
    "q_o_stream_dedup_replay", "q_o_stream_session_replay",
    "q_o_stream_running_stats", "q_o_stream_txlog_sink",
    "q_o_stream_custom_session", "q_o_stream_txlog_source",
    "q_o_stream_txlog_incremental", "q_o_stream_txlog_pipeline",
    "q_o_stream_txlog_partition", "q_o_stream_txlog_rename",
    "q_o_stream_txlog_cdf", "q_o_stream_static_enrich",
    "q_o_stream_window_replay", "q_o_stream_outer_replay",
    "q_gold_publish_jdbc", "q_p11_backfill_fact",
    "q_x_dedup_clusters", "q_x_allpairs_jaccard")

  /** Fork one child JVM per segment (same java binary, same JVM args,
    * same classpath, same environment) and collect its TSV fragment.
    * Sequential — segments must not contend with each other for cores.
    */
  private def runSegmented(segs: Seq[Seq[String]])
      : (Seq[(String, Seq[Run])], Int) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val cp = System.getProperty("java.class.path")
    var cgErrors = 0
    val all = segs.zipWithIndex.flatMap { case (seg, i) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-bench-seg")
      val namesFile = dir.resolve("names.txt")
      val outFile = dir.resolve("runs.tsv")
      java.nio.file.Files.write(namesFile,
        seg.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] segment ${i + 1}/${segs.size}: " +
        s"${seg.size} queries (${seg.head} .. ${seg.last})")
      val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SEGMENT_OUT", outFile.toString)
      pb.environment().put("SPARK_GRAFT_NAMES_FILE", namesFile.toString)
      // keep THIS process's stdout clean for the driver's tail parser:
      // workers never print the JSON lines, but any stray child stdout
      // goes to a per-segment log, child stderr passes straight through
      pb.redirectOutput(dir.resolve("stdout.log").toFile)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val exit = pb.start().waitFor()
      val parsed =
        if (exit == 0 && java.nio.file.Files.exists(outFile))
          parseFragment(new String(java.nio.file.Files.readAllBytes(outFile),
            java.nio.charset.StandardCharsets.UTF_8))
        else {
          System.err.println(s"[bench] segment ${i + 1} FAILED (exit $exit), " +
            s"stdout tail at ${dir.resolve("stdout.log")}")
          (seg.map(_ -> Seq(Run(-1.0, 0L, 0L, 0L))), 0)
        }
      cgErrors += parsed._2
      parsed._1
    }
    (all, cgErrors)
  }

  private def writeFragment(path: String,
      results: Seq[(String, Seq[Run])], cgErrors: Int): Unit = {
    val lines = results.map { case (name, rs) =>
      Seq(name,
        rs.map(r => f(r.sec)).mkString(","),
        rs.map(_.cpuMs).mkString(","),
        rs.map(_.gcMs).mkString(","),
        rs.map(_.peakMb).mkString(",")).mkString("\t")
    } :+ s"#codegen_errors\t$cgErrors"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def parseFragment(text: String): (Seq[(String, Seq[Run])], Int) = {
    var cg = 0
    val rows = text.linesIterator.filter(_.nonEmpty).flatMap { line =>
      val parts = line.split("\t", -1)
      if (parts(0) == "#codegen_errors") { cg += parts(1).toInt; None }
      else {
        val secs = parts(1).split(",").map(_.toDouble)
        val cpus = parts(2).split(",").map(_.toLong)
        val gcs  = parts(3).split(",").map(_.toLong)
        val hps  = parts(4).split(",").map(_.toLong)
        Some(parts(0) -> secs.indices.map(k => Run(secs(k), gcs(k), hps(k), cpus(k))))
      }
    }.toSeq
    (rows, cg)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = envInt("SPARK_GRAFT_REPS", 2).max(1)
    // optional name filter (regex) for focused iteration on one hot query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    sys.env.get("SPARK_GRAFT_NAMES_FILE") match {
      case Some(namesFile) =>
        // ---- segment worker: measure, write fragment, exit ----
        val sel = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(namesFile)),
          java.nio.charset.StandardCharsets.UTF_8).linesIterator
          .filter(_.nonEmpty).toSeq
        val (results, cg) = runQueries(sfDir, sel, reps)
        writeFragment(sys.env("SPARK_GRAFT_SEGMENT_OUT"), results, cg)
      case None =>
        // default 5: the kernel-heavy similarity family alone filled a
        // 3-segment chunk, and one JIT deopt dice-roll inside it still
        // inflated sibling queries 2-3x (isolated minhash 3.6s vs 13.2s
        // in-suite); smaller chunks bound the blast radius at ~30s of
        // extra per-JVM startup for the whole suite
        val segments = envInt("SPARK_GRAFT_SEGMENTS", 5).max(1)
        val selected = allNames
          .filter(n => only.forall(_.findFirstIn(n).isDefined))
        val segmented = only.isEmpty && segments > 1 && selected.size > segments
        // heavy queries get one JVM each; the remainder splits into
        // `segments` contiguous name-ordered chunks as before
        val segs: Seq[Seq[String]] =
          if (segmented) {
            val (heavy, rest) = selected.partition(heavyQueries.contains)
            val chunk = math.max(1, (rest.size + segments - 1) / segments)
            rest.grouped(chunk).toSeq ++ heavy.map(Seq(_))
          } else Seq(selected)
        val (results, cgErrors) =
          if (segmented) runSegmented(segs)
          else runQueries(sfDir, selected, reps)
        emit(sfDir, reps, results, cgErrors, persist = only.isEmpty,
          segs = if (segmented) segs else Seq(selected))
    }
  }

  /** The artifact emission — identical whether the runs came from one JVM
    * or from merged segment fragments.
    */
  private def emit(sfDir: String, reps: Int, results: Seq[(String, Seq[Run])],
      cgErrors: Int, persist: Boolean, segs: Seq[Seq[String]]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val best = results.map { case (k, rs) => k -> rs.map(_.sec).min }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // full per-run diagnostics: every run's wall time, GC delta, peak heap.
    // min-of-N hid bimodality; this makes a slow outlier visible in the
    // artifact itself.
    val runsJson = results.map { case (k, rs) =>
      "\"" + k + "\":{" +
        "\"sec\":[" + rs.map(r => f(r.sec)).mkString(",") + "]," +
        "\"cpu_ms\":[" + rs.map(_.cpuMs).mkString(",") + "]," +
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
    val env = s""""heap_max_mb":${Runtime.getRuntime.maxMemory / (1024 * 1024)},"cpus":$cpus,"reps":$reps,"codegen_errors":$cgErrors"""
    // `failed` is explicit so a query that starts throwing can never read
    // as a speedup of the headline total.
    // segment composition: which queries shared which JVM — so a
    // cross-round comparison can attribute cpu inflation to segment
    // pollution from the artifact alone, without re-runs
    val segsJson = segs.map(_.map("\"" + _ + "\"").mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":${f(total)},"unit":"sec","production_sec":${f(production)},"baseline_sec":${f(baselineSec)},"exact_similarity_sec":${f(exactSimSec)},"n_failed":${failed.size},"failed":${failed.mkString("[", ",", "]")},$env,"queries":$qs,"runs":$runsJson,"segments":$segsJson,"sf":"$sfDir"}"""
    println(fullLine)
    val summary = s"""{"metric":"total","value":${f(total)},"unit":"sec","production_sec":${f(production)},"baseline_sec":${f(baselineSec)},"exact_similarity_sec":${f(exactSimSec)},"n_failed":${failed.size},"n_queries":${best.size},$env,"queries_file":"BENCH_FULL.json","sf":"$sfDir"}"""
    // persistence failures must be VISIBLE (an unwritable cwd silently
    // producing no artifacts looked like a bench bug), but still non-fatal
    def persistFile(path: String, line: String): Unit = scala.util.Try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.recover { case e =>
      System.err.println(s"[bench] persist $path failed: $e")
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
    if (persist) {
      persistFile("BENCH_FULL.json", fullLine)
      persistFile("BENCH_SUMMARY.json", summary)
    }
    System.err.println(summary)
    println(summary)
  }
}
