package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every lakehouse
  * schedules (Delta OPTIMIZE, Iceberg rewrite_data_files): streaming
  * ingests and dynamic partition overwrites leave thousands of KB-scale
  * files, and at 100 TB the resulting scan is dominated by open/footer
  * overhead and task-scheduling latency, not bytes. Compaction rewrites a
  * directory into files near a target size and publishes atomically.
  *
  * Sizing reads the FILE LISTING (`_metadata.file_size` — metadata-scale,
  * no data scan) to pick the output file count: `ceil(totalBytes /
  * targetBytes)`, floored at 1. The rewrite is one `repartition(n)` round
  * robin — even output sizes, no key skew — or `repartition(n, keys)`
  * when the caller wants the compacted files to keep a bucketed layout
  * (so downstream Bloom/stats indexes stay selective per file).
  *
  * Publish is write-to-temp + rename swap (the same tmp+rename move as
  * `EventStream.aggMaintainStream`). Each RENAME is atomic, but the swap
  * is two of them, so the publish as a whole is not: compaction requires
  * a maintenance window — SINGLE WRITER, NO CONCURRENT READERS — like
  * every directory-swap maintenance pass over plain parquet (table
  * formats buy concurrent publish with a manifest layer; see SCALING.md
  * §ACID). Concretely: (a) between rename(dst → bak) and
  * rename(tmp → dst) the table path briefly does not exist, so a reader
  * racing the swap fails its file listing; (b) files a concurrent writer
  * adds after the compaction's read snapshot are dropped by the swap;
  * (c) on any failure after the first rename the original directory is
  * restored from `.__compact_old` (best effort — if even the restore
  * rename fails, the data survives intact at `.__compact_old` and the
  * thrown error names it). A crash BEFORE the first rename leaves the
  * source untouched; the stale `.__compact_tmp`/`.__compact_old` staging
  * dirs are reclaimed by the next run.
  */
object Compaction {

  /** Plan only: (n_files, total_bytes, target_files) from the listing. */
  def plan(spark: SparkSession, path: String, targetBytes: Long): (Long, Long, Int) = {
    require(targetBytes > 0, s"Compaction: targetBytes must be > 0, got $targetBytes")
    val listing = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("bytes"))
      .groupBy("file").agg(first("bytes").as("bytes"))
      .agg(count(lit(1)).as("n"), sum("bytes").as("total"))
      .head()
    val nFiles = listing.getLong(0)
    val total = listing.getLong(1)
    val target = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    (nFiles, total, target)
  }

  /** Compact `path` in place toward `targetBytes` per file. Returns the
    * number of output files. `bucketKeys` non-empty keeps a hash-bucketed
    * layout; empty means round-robin (even sizes).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      bucketKeys: Seq[String] = Seq.empty
  ): Int = {
    val (_, _, target) = plan(spark, path, targetBytes)
    val df = spark.read.parquet(path)
    val out =
      if (bucketKeys.isEmpty) df.repartition(target)
      else df.repartition(target, bucketKeys.map(col): _*)
    val tmp = path.stripSuffix("/") + ".__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".__compact_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(dst, bak))
      throw new java.io.IOException(s"Compaction: could not stage $path aside")
    // From here the table path is absent until the publish rename lands —
    // restore the original on ANY failure (thrown or returned-false), so
    // a crash in the window cannot strand the table at .__compact_old.
    try {
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
        throw new java.io.IOException(s"Compaction: could not publish $tmp")
    } catch {
      case publishFailure: Throwable =>
        val restored =
          try fs.rename(bak, dst)
          catch { case _: Throwable => false }
        if (!restored)
          throw new java.io.IOException(
            s"Compaction: publish failed AND restore failed - original data " +
              s"is intact at $bak; rename it back to $path manually",
            publishFailure)
        throw publishFailure
    }
    fs.delete(bak, true)
    target
  }
}
