package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType

import graft.gold.TxLog

/** BATCH read support for the `graft-txlog` format —
  * `spark.read.format("graft-txlog").option("path", dir).load()` and
  * `CREATE TABLE ... USING `graft-txlog`` (SQL over TxLog tables), the
  * round-12 verdict's top gap: the streaming format existed in both
  * directions while batch access was Scala-API-only (`TxLog.read`).
  *
  * Two relation shapes, chosen by the snapshot being served:
  *
  *  - **No active deletion vectors** (the common case): a native
  *    [[HadoopFsRelation]] over exactly the snapshot's files with the
  *    LOG-RECORDED schema as the authority — the ordinary distributed
  *    parquet plan, so filter pushdown, column pruning, AND the injected
  *    `RewriteTxLogStatsScan` rule (the file paths' parent is the table
  *    dir, the shape the rule matches) all apply with zero special
  *    casing. The explicit log schema also sidesteps footer MERGING's
  *    refusal of int→long widened re-declares (parquet TYPE WIDENING
  *    reads them fine — the round-12 gotcha).
  *  - **Active deletion vectors**: a [[TxLogDvRelation]] placeholder that
  *    (a) ALWAYS works — its `TableScan` fallback delegates to
  *    `TxLog.read`'s DV anti-join plan through an RDD boundary, correct
  *    in any session — and (b) in a Graft session is EXPANDED by the
  *    injected `ExpandTxLogDvScan` rule into the native anti-join plan
  *    itself (broadcast DV set, table never shuffled, pushdown intact) —
  *    the same plan `TxLog.read` builds, visible in `explain`.
  *
  * Time travel via options: `versionAsOf` (a log version) or
  * `timestampAsOf` (epoch millis, or `yyyy-MM-dd HH:mm:ss[.S]` read as
  * UTC — the engine's fixed session zone), mutually exclusive.
  */
object TxLogRelation {

  val VersionAsOfKey = "versionAsOf"
  val TimestampAsOfKey = "timestampAsOf"

  /** Parse `timestampAsOf`: epoch millis, or a UTC wall-clock literal. */
  private[streaming] def parseTsOption(s: String): Long =
    if (s.matches("-?\\d+")) s.toLong
    else
      try java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      catch {
        case e: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"graft-txlog: $TimestampAsOfKey must be epoch millis or " +
              s"'yyyy-MM-dd HH:mm:ss[.S]' (UTC), got '$s'", e)
      }

  /** The log schema with every field (recursively) nullable — the shape
    * a file-source read serves regardless of how the writer declared its
    * frame (Spark's own file relations normalize the same way; the
    * public `asNullable` equivalent).
    */
  private def allNullable(s: StructType): StructType = {
    import org.apache.spark.sql.types._
    def nt(d: DataType): DataType = d match {
      case st: StructType =>
        StructType(st.fields.map(f =>
          f.copy(dataType = nt(f.dataType), nullable = true)))
      case ArrayType(et, _) => ArrayType(nt(et), containsNull = true)
      case MapType(k, v, _) => MapType(nt(k), nt(v), valueContainsNull = true)
      case other => other
    }
    nt(s).asInstanceOf[StructType]
  }

  /** The version the read serves, from the time-travel options. */
  private[streaming] def resolveVersion(path: String,
      parameters: Map[String, String]): Long = {
    val v = parameters.get(VersionAsOfKey).map(_.toLong)
    val ts = parameters.get(TimestampAsOfKey).map(parseTsOption)
    require(v.isEmpty || ts.isEmpty,
      s"graft-txlog: $VersionAsOfKey and $TimestampAsOfKey are mutually " +
        "exclusive - a read serves exactly one version")
    v.orElse(ts.map(TxLog.versionAtTimestamp(path, _))).getOrElse(
      TxLog.currentVersion(path).getOrElse(throw new IllegalArgumentException(
        s"graft-txlog: no TxLog table at $path")))
  }

  /** The batch relation for `path` at the options' version — see the
    * object scaladoc for the two shapes. `catalogSchema` is the schema a
    * catalog table pinned at CREATE time (Spark's resolver requires the
    * relation to return it EXACTLY); it must still match the log's
    * current schema or the read refuses with re-registration guidance —
    * serving a stale narrower schema would silently drop evolved columns.
    */
  def batchRelation(sqlContext: SQLContext,
      parameters: Map[String, String],
      catalogSchema: Option[StructType]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = TxLogSource.tablePath(parameters)
    val version = resolveVersion(path, parameters)
    val snap = TxLog.snapshot(path, Some(version))
    val logSchema: StructType = snap.schema.getOrElse {
      require(snap.files.nonEmpty,
        s"graft-txlog: version $version of $path has no files and no " +
          "recorded schema (legacy log) - nothing to serve")
      spark.read.option("mergeSchema", "true")
        .parquet(snap.files.map(f => s"$path/$f"): _*).schema
    }
    // file sources serve every column nullable; catalog registration
    // stored exactly this shape, so the equality below is well-defined
    val served = allNullable(logSchema)
    catalogSchema.foreach { cat =>
      require(cat == served,
        s"graft-txlog: the catalog schema for $path no longer matches " +
          s"the log's current schema (catalog: ${cat.simpleString}; log: " +
          s"${served.simpleString}) - the table evolved after " +
          "registration; re-register it (SqlFront.refreshCatalog)")
    }
    val active = snap.dvs.filter { case (f, _) => snap.files.contains(f) }
    if (active.nonEmpty)
      TxLogDvRelation(path, version, served)(spark)
    else {
      val index = new InMemoryFileIndex(spark,
        snap.files.map(f => new Path(s"$path/$f")), Map.empty, Some(served))
      HadoopFsRelation(index, partitionSchema = StructType(Nil),
        dataSchema = served, bucketSpec = None,
        fileFormat = new ParquetFileFormat, options = Map.empty)(spark)
    }
  }
}

/** Placeholder relation for a DV'd TxLog snapshot — carries everything
  * the `ExpandTxLogDvScan` rule needs to splice in the native anti-join
  * plan; the `TableScan` fallback keeps extension-less sessions correct
  * (at an RDD-boundary cost the expansion removes). The schema is pinned
  * at relation-construction time; the version is pinned too, so the
  * fallback scan and the expanded plan serve the SAME snapshot even if
  * the table commits between planning and execution.
  */
case class TxLogDvRelation(path: String, version: Long,
    override val schema: StructType)(
    @transient val session: SparkSession)
  extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = session.sqlContext

  override def buildScan(): RDD[Row] =
    TxLog.read(session, path, asOf = Some(version)).rdd

  override def toString: String = s"TxLogDvRelation[$path, v=$version]"
}
