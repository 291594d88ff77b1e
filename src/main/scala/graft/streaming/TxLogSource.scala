package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamingSourceBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.gold.TxLog

/** INCREMENTAL streaming source over a [[graft.gold.TxLog]] table — the
  * real Delta-source shape (round 11 proved the semantics with a
  * copy-based replay harness; this replaces it as infrastructure):
  *
  *  - **Offset = log version.** `getOffset` resolves the table's newest
  *    committed version (checkpoint-hint probe, O(commits since
  *    checkpoint)); a micro-batch covers the half-open version range
  *    `(start, end]` and reads exactly those commits' ADD files **in
  *    place** — zero copies, zero staging, the ordinary distributed
  *    parquet scan with pruning/pushdown intact.
  *  - **Orphan-blind by construction.** The batch file list comes from the
  *    version records, never a directory listing — a crashed writer's
  *    uncommitted data files are invisible, and a torn listing on an
  *    eventually-consistent store can't serve phantom files.
  *  - **Resumable.** The engine checkpoints the version offsets; a
  *    restarted query's first `getBatch` receives the checkpointed range
  *    and continues from the next version. New commits made while the
  *    query was down are picked up as ordinary new offsets.
  *  - **Append-only contract.** A version carrying REMOVE actions raises a
  *    named error (same contract as Delta's streaming source without
  *    `ignoreChanges`): row-level change consumers belong on
  *    [[graft.gold.TxLog.changes]].
  *  - **Admission control.** `maxVersionsPerTrigger` (default 1) bounds how
  *    many commits one micro-batch covers — the Delta
  *    `maxFilesPerTrigger` role. Rate limiting makes `getOffset` stateful
  *    (it must advance from what was already handed out, not from the
  *    table head), so the handed-out watermark is persisted under the
  *    engine-provided source-metadata dir and recovered on restart — the
  *    FileStreamSource pattern; without it a restarted source could hand
  *    out an offset BELOW the engine's committed one and regress the
  *    offset log. The persisted value is a lower-bound cursor, never a
  *    correctness input: batch CONTENT is always derived from the version
  *    records alone.
  *
  * Vacuum coupling (documented, inherent): a lagging reader's next batch
  * references files only retained versions hold — vacuum with a horizon
  * shorter than the consumer's lag breaks the replay window, exactly
  * Delta's source-vs-vacuum retention coupling.
  *
  * Usage: `spark.readStream.format("graft-txlog").option("path", dir)
  * .load()` (service-registered short name), or the
  * [[EventStream.streamTxLogTable]] wrapper.
  */
class TxLogSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-txlog"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = TxLogSource.tablePath(parameters)
    (shortName(),
      schema.getOrElse(TxLogSource.tableSchema(sqlContext.sparkSession, path)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val path = TxLogSource.tablePath(parameters)
    val sch = schema.getOrElse(TxLogSource.tableSchema(sqlContext.sparkSession, path))
    val maxVersions = parameters.get(TxLogSource.MaxVersionsKey)
      .map(_.toLong).getOrElse(1L)
    require(maxVersions >= 1,
      s"graft-txlog: ${TxLogSource.MaxVersionsKey} must be >= 1 (got $maxVersions)")
    new TxLogSource(sqlContext.sparkSession, path, sch, metadataPath, maxVersions)
  }
}

object TxLogSource {
  val MaxVersionsKey = "maxVersionsPerTrigger"

  private[streaming] def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-txlog source: 'path' option (the TxLog table dir) is required"))

  /** The table's schema at its current version: the log's recorded schema
    * (authoritative even for file-less versions), falling back to the
    * newest snapshot's parquet footers for pre-schema legacy logs.
    */
  private[streaming] def tableSchema(spark: SparkSession, path: String): StructType = {
    val snap = TxLog.snapshot(path)
    snap.schema.getOrElse {
      require(snap.files.nonEmpty,
        s"graft-txlog source: $path has no recorded schema and no files")
      spark.read.parquet(snap.files.map(f => s"$path/$f"): _*).schema
    }
  }
}

/** The version-offset machinery shared by both TxLog streaming sources
  * ([[TxLogSource]] append rows, [[TxLogCdfSource]] change rows): offsets
  * are log versions; `getOffset` advances at most `maxVersionsPerTrigger`
  * past the handed-out cursor; the cursor is persisted (atomic tmp+move)
  * under the engine-provided source-metadata dir so a restarted,
  * rate-limited source never re-offers an offset below the engine's
  * committed one (regressing the offset log). `getBatch` also advances the
  * cursor from the engine's own checkpointed offsets — belt-and-braces: a
  * lost metadata file degrades to one recovery step, never to wrong data.
  * The cursor is a lower-bound cursor only; batch CONTENT always derives
  * from the version records.
  */
abstract class TxLogVersionedSource(
    protected val spark: SparkSession,
    protected val tablePath: String,
    metadataPath: String,
    maxVersionsPerTrigger: Long) extends Source {

  /** Batch covering committed versions `(from, to]`, both bounds resolved. */
  protected def batchFor(fromExclusive: Long, toInclusive: Long): DataFrame

  @volatile private var maxHandedOut: Long = readCursor()

  private def cursorFile = new java.io.File(metadataPath, "graft-txlog-cursor")

  private def readCursor(): Long =
    try {
      val f = cursorFile
      if (!f.exists()) -1L
      else new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    } catch { case scala.util.control.NonFatal(_) => -1L }

  private def writeCursor(v: Long): Unit = {
    val dir = new java.io.File(metadataPath)
    if (!dir.exists()) dir.mkdirs()
    val tmp = java.nio.file.Files.createTempFile(dir.toPath, ".cursor", ".tmp")
    try {
      java.nio.file.Files.write(tmp,
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, cursorFile.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally { java.nio.file.Files.deleteIfExists(tmp); () }
  }

  private def advanceCursor(v: Long): Unit =
    if (v > maxHandedOut) { maxHandedOut = v; writeCursor(v) }

  private def versionOf(o: OffsetV1): Long = o.json.trim.toLong

  final override def getOffset: Option[OffsetV1] =
    TxLog.currentVersion(tablePath).map { cur =>
      val end = math.min(cur, maxHandedOut + maxVersionsPerTrigger)
      advanceCursor(end)
      LongOffset(end)
    }

  final override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L) // exclusive
    val to = versionOf(end) // inclusive
    advanceCursor(to)
    batchFor(from, to)
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"${getClass.getSimpleName}[$tablePath]"
}

class TxLogSource(
    spark: SparkSession,
    tablePath: String,
    override val schema: StructType,
    metadataPath: String,
    maxVersionsPerTrigger: Long)
  extends TxLogVersionedSource(spark, tablePath, metadataPath,
    maxVersionsPerTrigger) {

  protected def batchFor(from: Long, to: Long): DataFrame = {
    val files = (from + 1 to to).flatMap { v =>
      val (added, removed) = TxLog.fileActions(tablePath, v)
      if (removed.nonEmpty) throw new IllegalStateException(
        s"graft-txlog source: version $v of $tablePath removes files - " +
          "this source streams APPEND-ONLY tables (row-level change " +
          "consumers belong on the graft-txlog-cdf source / TxLog.changes)")
      added
    }
    if (files.isEmpty) StreamingSourceBridge.emptyStreamingBatch(spark, schema)
    else StreamingSourceBridge.streamingFileBatch(spark, schema,
      files.map(f => s"$tablePath/$f"))
  }
}

/** STREAMING CHANGE DATA FEED over a TxLog table — the Delta
  * `readChangeFeed` streaming shape, built on the same version-offset
  * machinery as [[TxLogSource]]: each micro-batch carries the covered
  * versions' ROW-LEVEL changes — every row of a commit's removed files as
  * `_change_type = 'delete'` and every row of its added files as
  * `'insert'`, tagged `_commit_version` — so delete/replace/compact
  * commits stream too (exactly [[graft.gold.TxLog.changes]], incremental).
  * Within a version deletes precede inserts in the batch's union order;
  * consumers that fold by key must apply per `_commit_version` in
  * ascending order (the [[EventStream.applyCdfBatch]] consumer does).
  *
  * Every file is read IN PLACE with the query-start schema pinned
  * (pre-evolution files null-fill the widened columns — the same contract
  * as the batch feed's union alignment). Vacuum coupling is inherited
  * from the batch feed and is one notch tighter here: a lagging stream's
  * next batch needs the REMOVED files of its uncommitted versions still
  * on disk, so retention must cover consumer lag (Delta's CDF retention
  * coupling).
  *
  * Usage: `spark.readStream.format("graft-txlog-cdf").option("path", dir)
  * .load()`.
  */
class TxLogCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-txlog-cdf"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = TxLogSource.tablePath(parameters)
    (shortName(), schema.getOrElse(TxLogCdfSource.cdfSchema(
      TxLogSource.tableSchema(sqlContext.sparkSession, path))))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val path = TxLogSource.tablePath(parameters)
    val dataSchema = TxLogSource.tableSchema(sqlContext.sparkSession, path)
    val maxVersions = parameters.get(TxLogSource.MaxVersionsKey)
      .map(_.toLong).getOrElse(1L)
    require(maxVersions >= 1,
      s"graft-txlog-cdf: ${TxLogSource.MaxVersionsKey} must be >= 1 (got $maxVersions)")
    new TxLogCdfSource(sqlContext.sparkSession, path, dataSchema,
      metadataPath, maxVersions)
  }
}

object TxLogCdfSource {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  def cdfSchema(data: StructType): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType}
    data.add(ChangeTypeCol, StringType, nullable = false)
      .add(CommitVersionCol, LongType, nullable = false)
  }
}

class TxLogCdfSource(
    spark: SparkSession,
    tablePath: String,
    dataSchema: StructType,
    metadataPath: String,
    maxVersionsPerTrigger: Long)
  extends TxLogVersionedSource(spark, tablePath, metadataPath,
    maxVersionsPerTrigger) {

  override val schema: StructType = TxLogCdfSource.cdfSchema(dataSchema)

  protected def batchFor(from: Long, to: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val parts = (from + 1 to to).flatMap { v =>
      val (added, removed) = TxLog.fileActions(tablePath, v)
      def part(files: Seq[String], kind: String): Option[DataFrame] =
        if (files.isEmpty) None
        // dataSchema pinned at query start: narrower pre-evolution files
        // null-fill, every part has IDENTICAL shape, so the union below
        // needs no name-based alignment
        else Some(StreamingSourceBridge.streamingFileBatch(spark, dataSchema,
            files.map(f => s"$tablePath/$f"))
          .withColumn(TxLogCdfSource.ChangeTypeCol, lit(kind))
          .withColumn(TxLogCdfSource.CommitVersionCol, lit(v)))
      // deletes first within a version — same ordering contract as the
      // batch feed (a rewrite's reinserts land after the old rows leave)
      part(removed, "delete").toSeq ++ part(added, "insert").toSeq
    }
    if (parts.isEmpty) StreamingSourceBridge.emptyStreamingBatch(spark, schema)
    else parts.reduce(_.unionAll(_))
  }
}
