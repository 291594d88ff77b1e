package graft.core

import org.apache.spark.sql.SparkSession

/** Single place for engine Spark config, so Verify/Bench/tests and any
  * embedding application agree on semantics.
  *
  * Mirrors the reference's runtime posture (AQE on, coalescing, skew-join
  * handling, UTC timestamps — reference `conf/spark-defaults.conf:13-24`,
  * `requirements/meta/meta_module_06_requirements.md:21`) but sized for the
  * actual hardware: shuffle partitions default to the core count, not a
  * hardcoded 200 (the reference's own anti-pattern at scale).
  *
  * `partitionOverwriteMode=dynamic` is load-bearing: the reference overwrites
  * facts per `run_date` partition (Meta_Guideline.md:3033-3038); without
  * dynamic mode Spark would truncate the whole table on each run.
  */
object GraftSession {

  def defaultParallelism: Int = Runtime.getRuntime.availableProcessors()

  def builder(
      master: String = s"local[$defaultParallelism]",
      appName: String = "graft",
      shufflePartitions: Int = defaultParallelism
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // The driver testdata stores events.ts as Parquet TIMESTAMP(NANOS),
      // which Spark's vectorized reader rejects; read as Long nanos and
      // convert in Tables.events (truncation to µs matches DuckDB).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(shufflePartitions: Int = defaultParallelism): SparkSession = {
    val s = builder(shufflePartitions = shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
