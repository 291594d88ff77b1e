package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: query-name regex for focused big-SF spot-checks
    // (same contract as tools/check_oracle.py's nameRegex)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, r) => (s, o, Some(r.r))
      case _ => sys.error("usage: Verify <sfDir> <outDir> [nameRegex]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-verify",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Wipe stale outputs: a query that fails this run must NOT leave a
    // previous run's parquet behind to be compared as if fresh.
    val out = new java.io.File(outDir)
    if (out.exists()) core.Fs.rmTree(out)
    out.mkdirs()
    // Write the oracle manifest FIRST: it depends only on SparkEntry, so a
    // later hung/OOM-killed query costs that one query, not the whole
    // round (a missing manifest would make the driver's json.load fail and
    // silently zero every result). Control-char-safe JSON via Reports.
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      runner.Reports.toJson(SparkEntry.oracleSql))
    // Interpreted-fallback watchdog: audits every executed plan (via the
    // QueryExecutionListener, so the write's own QueryExecution — the one
    // that actually ran — is the one inspected) and prints a loud
    // [codegen-audit] line if a graft kernel ran outside codegen.
    val watchdog = plans.CodegenAudit.attach(spark)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      // drain the async listener bus BEFORE advancing the attribution name:
      // in-flight QueryExecution events from query K must not be reported
      // under K+1's name
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      watchdog.current.set(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    if (watchdog.errors.get() > 0)
      System.err.println(
        s"[codegen-audit] TOTAL interpreted-kernel findings: ${watchdog.errors.get()}")
    spark.stop()
  }
}
