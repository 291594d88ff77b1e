package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal OWN commit log — the transactional kernel of a lakehouse table
  * format (Delta's `_delta_log`, Iceberg's snapshots), re-expressed over
  * plain parquet in ~200 lines. The real formats are environment-blocked
  * (SCALING.md §ACID: the offline cache ships no lakehouse artifacts), and
  * a full spec-compatible implementation would be out of scope — but the
  * SEMANTICS a user actually relies on are small and testable end-to-end:
  *
  *  - **Atomic commits / readers never see partial writes**: data files are
  *    written FIRST (immutable, never mutated in place), then a version
  *    file `_graft_txlog/<v>.json` listing the table's COMPLETE file set is
  *    published with an atomic create — readers resolve the newest version
  *    file and read exactly its list, so an interrupted writer leaves only
  *    invisible orphan data files, never a torn table.
  *  - **Optimistic concurrency**: the version file is created with
  *    `Files.createFile` (atomic fail-if-exists); two writers racing the
  *    same version → exactly one wins, the loser gets a named
  *    `ConcurrentModificationException` and must re-read + retry (the
  *    Delta/Iceberg commit protocol).
  *  - **Snapshot isolation + time travel**: `read(asOf = v)` serves any
  *    retained version — versions are immutable once written.
  *  - **DELETE without eager rewrite of everything**: `deleteWhere` rewrites
  *    ONLY the files that contain matching rows (file-level pruning by
  *    scanning each file's match count — at scale a stats index would
  *    pre-prune); untouched files carry over by reference.
  *
  * NOT implemented (documented, not hidden): checkpoint compaction of the
  * log, column-level stats in the log, multi-table transactions.
  * ([[vacuum]] covers orphan/superseded data-file cleanup under a
  * retention horizon.) The point is exercising the COMMIT SEMANTICS
  * the MERGE seam (`DimStore`) pins, end-to-end, with a DuckDB oracle over
  * the final states — not re-shipping Delta.
  *
  * Atomic-create caveat: `Files.createFile` is atomic on local/HDFS
  * semantics; on eventual-consistency object stores the real formats use a
  * coordination service (DynamoDB for S3 Delta) — same seam, swapped
  * primitive.
  */
object TxLog {

  val LogDirName = "_graft_txlog"

  final case class Snapshot(version: Long, files: Seq[String])

  final class ConflictException(version: Long)
    extends java.util.ConcurrentModificationException(
      s"TxLog: version $version was committed by another writer - " +
        "re-read the table and retry the commit")

  private def logDir(path: String) = new java.io.File(path, LogDirName)

  private def versionFile(path: String, v: Long) =
    new java.io.File(logDir(path), f"$v%020d.json")

  /** Newest committed version, or None for a non-table. */
  def currentVersion(path: String): Option[Long] = {
    val files = Option(logDir(path).listFiles()).getOrElse(Array.empty)
    val vs = files.filter(_.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  def snapshot(path: String, asOf: Option[Long] = None): Snapshot = {
    val v = asOf.orElse(currentVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"TxLog: no table at $path"))
    val f = versionFile(path, v)
    require(f.exists(), s"TxLog: version $v does not exist at $path " +
      s"(newest is ${currentVersion(path).getOrElse(-1L)})")
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    // one-line JSON of the shape {"version":N,"files":["name",...]}
    val files = "\"files\"\\s*:\\s*\\[(.*?)\\]".r
      .findFirstMatchIn(text).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    Snapshot(v, files)
  }

  /** Read a snapshot as a DataFrame (file names resolve under `path`). */
  def read(spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(path, asOf)
    if (snap.files.isEmpty)
      // schema from ANY data file ever written would be arbitrary; an empty
      // table with no history has no schema — callers handle init
      throw new IllegalArgumentException(
        s"TxLog: version ${snap.version} of $path has no files")
    spark.read.parquet(snap.files.map(f => s"$path/$f"): _*)
  }

  /** Publish `files` as version `v` — atomic create, loser raises. */
  private def publish(path: String, v: Long, files: Seq[String]): Unit = {
    val dir = logDir(path)
    if (!dir.exists()) dir.mkdirs()
    val json = s"""{"version":$v,"files":[${
      files.map("\"" + _ + "\"").mkString(",")}]}"""
    val target = versionFile(path, v)
    try {
      val p = java.nio.file.Files.createFile(target.toPath) // atomic
      java.nio.file.Files.write(p,
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConflictException(v)
    }
  }

  /** Write `df`'s rows as new immutable data files under `path`, WITHOUT
    * committing them — returns the new file names. A crash after this
    * leaves invisible orphans only.
    */
  private def writeDataFiles(df: DataFrame, path: String): Seq[String] = {
    val stage = java.nio.file.Files.createTempDirectory("graft_txdata")
    try {
      df.write.mode("overwrite").parquet(stage.toString)
      val parts = stage.toFile.listFiles().filter(_.getName.startsWith("part-"))
      parts.map { f =>
        val name = f.getName
        // plain move: these files are INVISIBLE until the version file
        // publishes, so per-file atomicity is not needed (and ATOMIC_MOVE
        // would fail across filesystems)
        java.nio.file.Files.move(f.toPath, new java.io.File(path, name).toPath)
        name
      }.toSeq
    } finally graft.core.Fs.rmTree(stage.toFile)
  }

  /** Create the table at version 0. */
  def init(df: DataFrame, path: String): Snapshot = {
    require(currentVersion(path).isEmpty, s"TxLog: table already exists at $path")
    new java.io.File(path).mkdirs()
    val files = writeDataFiles(df, path)
    publish(path, 0L, files)
    Snapshot(0L, files)
  }

  /** Append rows: new files + carried-over references, one new version.
    * `expectedVersion` is the optimistic-concurrency token: pass the
    * version you READ; if someone committed since, the publish conflicts.
    */
  def append(df: DataFrame, path: String, expectedVersion: Long): Snapshot = {
    val base = snapshot(path, Some(expectedVersion))
    val files = base.files ++ writeDataFiles(df, path)
    publish(path, expectedVersion + 1, files)
    Snapshot(expectedVersion + 1, files)
  }

  /** VACUUM: physically delete (a) version files older than the newest
    * `retainVersions` and (b) data files referenced by NO retained version
    * — both orphans from losing/crashed writers and files superseded by
    * delete/replace rewrites. Time travel below the retention horizon
    * becomes an error (the lakehouse trade every format makes). Returns
    * the deleted file names.
    *
    * Single-writer window contract, like every VACUUM: a reader holding a
    * below-horizon snapshot open races the delete — retain generously on
    * shared storage.
    */
  def vacuum(path: String, retainVersions: Int = 2,
      minAgeMs: Long = 24L * 3600 * 1000): Seq[String] = {
    require(retainVersions >= 1, "TxLog.vacuum: must retain >= 1 version")
    val all = Option(logDir(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json").toLong).sorted
    require(all.nonEmpty, s"TxLog: no table at $path")
    val kept = all.takeRight(retainVersions)
    val referenced = kept.flatMap(v => snapshot(path, Some(v)).files).toSet
    val droppedVersions = all.dropRight(retainVersions).map { v =>
      val f = versionFile(path, v)
      java.nio.file.Files.delete(f.toPath)
      f.getName
    }
    // minAgeMs guards the WRITER race (not just readers): an in-flight
    // commit's freshly-moved data files are referenced by NO version yet —
    // deleting them would let the commit publish a version pointing at
    // nothing. Only files older than the threshold can be proven
    // abandoned (Delta's deletedFileRetentionDuration, same reasoning);
    // pass 0 only when no writer can be in flight.
    val horizon = System.currentTimeMillis() - minAgeMs
    val droppedData = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-") &&
        !referenced.contains(f.getName) && f.lastModified() < horizon)
      .map { f => java.nio.file.Files.delete(f.toPath); f.getName }
    (droppedVersions ++ droppedData).toSeq
  }

  /** ATOMIC replace-by-key: remove every row whose `nk` appears in `keys`
    * AND add `newData`, as ONE committed version — the commit shape a
    * transactional `MERGE INTO` needs (delete-then-append as two versions
    * would expose an intermediate state with the touched keys missing).
    * Only files containing touched keys are rewritten; the probe is a
    * per-file semi-join count (stats-index pre-pruning is the 100-TB
    * path, same protocol).
    */
  def replaceWhereKeys(spark: SparkSession, path: String, keys: DataFrame,
      nk: Seq[String], newData: DataFrame, expectedVersion: Long): Snapshot = {
    val base = snapshot(path, Some(expectedVersion))
    val k = keys.select(nk.map(col): _*)
    val touched = base.files.filter { f =>
      spark.read.parquet(s"$path/$f")
        .join(k, nk, "left_semi").limit(1).count() > 0
    }
    val untouched = base.files.filterNot(touched.contains)
    val rewritten =
      if (touched.isEmpty) Nil
      else {
        val survivors = spark.read
          .parquet(touched.map(f => s"$path/$f"): _*)
          .join(k, nk, "left_anti")
        if (survivors.isEmpty) Nil else writeDataFiles(survivors, path)
      }
    val added = writeDataFiles(newData, path)
    val files = untouched ++ rewritten ++ added
    publish(path, expectedVersion + 1, files)
    Snapshot(expectedVersion + 1, files)
  }

  /** Delete matching rows: only files CONTAINING matches are rewritten
    * (survivor rows re-written as new files); clean files carry over by
    * reference. At 100 TB the per-file match probe is served by a stats
    * index ([[StatsIndex]]) instead of a scan — the commit protocol is
    * identical.
    */
  def deleteWhere(spark: SparkSession, path: String,
      cond: org.apache.spark.sql.Column, expectedVersion: Long): Snapshot = {
    val base = snapshot(path, Some(expectedVersion))
    val touched = base.files.filter { f =>
      spark.read.parquet(s"$path/$f").filter(cond).limit(1).count() > 0
    }
    val untouched = base.files.filterNot(touched.contains)
    val rewritten =
      if (touched.isEmpty) Nil
      else {
        // SQL DELETE semantics: a NULL-valued predicate deletes NOTHING —
        // plain !cond would be NULL too and silently DROP those rows from
        // the rewritten files (while identical rows in untouched files
        // survived); coalesce makes survival explicit
        val survivors = spark.read
          .parquet(touched.map(f => s"$path/$f"): _*)
          .filter(!coalesce(cond, lit(false)))
        if (survivors.isEmpty) Nil else writeDataFiles(survivors, path)
      }
    publish(path, expectedVersion + 1, untouched ++ rewritten)
    Snapshot(expectedVersion + 1, untouched ++ rewritten)
  }
}
