package graft.sqlfront

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gold.TxLog

/** SQL MAINTENANCE PROCEDURES over TxLog tables — the Iceberg `CALL`
  * surface (`CALL cat.system.rewrite_data_files(...)`,
  * `expire_snapshots`, `rollback_to_snapshot`, ...) re-expressed through
  * Spark 4's native DSv2 stored-procedure API
  * ([[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]): a SQL
  * user operates a lakehouse table end-to-end without touching the Scala
  * API —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft_sys",
  *   "graft.sqlfront.GraftProcedureCatalog")
  * spark.sql("CALL graft_sys.system.history(path => '/data/t')")
  * spark.sql("CALL graft_sys.system.delete_partitions('/data/t', \"day = DATE'2024-01-01'\")")
  * spark.sql("CALL graft_sys.system.compact('/data/t')")
  * spark.sql("CALL graft_sys.system.vacuum('/data/t', 2, 0, false)")
  * spark.sql("CALL graft_sys.system.restore('/data/t', 3)")
  * spark.sql("CALL graft_sys.system.clone('/data/t', '/data/t_experiment')")
  * }}}
  *
  * Every mutating procedure runs under `TxLog.commitWithRetry`, so CALLs
  * racing other writers serialize through the optimistic-concurrency
  * protocol. Results come back as ordinary result sets (a driver-side
  * `LocalScan` — all outputs are metadata-scale: versions, file names,
  * counts), so `spark.sql("CALL ...")` composes with collect/show like
  * any query. Named arguments and declared defaults are handled by
  * Spark's own CALL analysis (`vacuum(path => '...', dry_run => true)`).
  *
  * Reads stay on the relation path (`CREATE TABLE ... USING graft-txlog`
  * / `spark.read.format("graft-txlog")`), where pushdown and the
  * injected pruning rules apply — procedures are for the OPERATIONS a
  * table needs, which V1 relations cannot express in SQL.
  */
class GraftProcedureCatalog extends CatalogPlugin with ProcedureCatalog {

  private var catalogName: String = "graft_sys"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }

  override def name(): String = catalogName

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    // accept `cat.proc` and `cat.system.proc` (the Iceberg convention);
    // any other namespace is a typo worth failing loudly
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the 'system' namespace - got " +
        s"${ident.namespace().mkString(".")}.${ident.name()}")
    GraftProcedureCatalog.procedures.getOrElse(
      ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"unknown graft procedure '${ident.name()}' (have: " +
          s"${GraftProcedureCatalog.procedures.keys.toSeq.sorted.mkString(", ")})"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedureCatalog.procedures.keys.toSeq.sorted
      .map(n => Identifier.of(Array("system"), n)).toArray
}

object GraftProcedureCatalog {

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType,
      defaultSql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(defaultSql).build()

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  /** Output-row builder: Scala values → InternalRow (strings to
    * UTF8String, Options unwrapped to null).
    */
  private def row(vals: Any*): InternalRow =
    new GenericInternalRow(vals.map {
      case s: String => u(s)
      case Some(v: Long) => v
      case Some(v: Int) => v
      case Some(s: String) => u(s)
      case None => null
      case other => other
    }.toArray)

  /** One procedure = unbound + bound in one object (binding is
    * signature-static here; Spark's CALL analysis aligns named args,
    * applies declared defaults, and casts before `call`).
    */
  private abstract class Proc(name0: String, desc: String,
      params0: Seq[ProcedureParameter], out: StructType)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = name0
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params0.toArray
    // side-effecting table operations; never constant-fold a CALL
    override def isDeterministic: Boolean = false
    def run(args: InternalRow, spark: SparkSession): Seq[InternalRow]
    override def call(args: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val resolved = run(args, spark).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = resolved
        override def readSchema(): StructType = out
        override def description(): String = s"graft.$name0 result"
      }).iterator()
    }
  }

  private val versionOut = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  private[sqlfront] val procedures: Map[String, UnboundProcedure] = Seq(

    new Proc("snapshot",
      "current (or as-of) snapshot summary of a TxLog table",
      Seq(in("path", StringType),
        inDefault("version", LongType, "NULL")),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = true),
        StructField("partition_columns", StringType, nullable = false),
        StructField("n_constraints", LongType, nullable = false),
        StructField("n_deletion_vectors", LongType, nullable = false)))) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val snap = TxLog.snapshot(a.getString(0).toString,
          if (a.isNullAt(1)) None else Some(a.getLong(1)))
        // one Set materialization: Seq.contains inside the loops would be
        // O(files x entries) on the driver at the 10^5-10^6-file scale
        // the partition machinery targets
        val fileSet = snap.files.toSet
        // row count from log stats when every file carries one (UPPER
        // bound under active DVs — report NULL then, never a wrong count)
        val rowsKnown = snap.dvs.isEmpty &&
          snap.files.forall(snap.stats.contains)
        Seq(row(snap.version, snap.files.size.toLong,
          if (rowsKnown) Some(snap.files.map(snap.stats(_).rows).sum)
          else None,
          snap.partitionCols.mkString(","),
          snap.constraints.size.toLong,
          snap.dvs.count { case (f, _) => fileSet.contains(f) }.toLong))
      }
    },

    new Proc("history",
      "commit audit trail of every retained version, newest first",
      Seq(in("path", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("ts_millis", LongType, nullable = true),
        StructField("operation", StringType, nullable = true),
        StructField("n_added_files", IntegerType, nullable = false),
        StructField("n_removed_files", IntegerType, nullable = false),
        StructField("rows_added", LongType, nullable = true)))) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] =
        TxLog.commitInfos(a.getString(0).toString).map { ci =>
          row(ci.version, ci.timestampMillis, ci.operation.orNull,
            ci.addedFiles, ci.removedFiles, ci.rowsAdded)
        }
    },

    new Proc("vacuum",
      "physically delete versions below the retention horizon and " +
        "unreferenced data files (dry_run => true reports only; " +
        "reader_floor_checkpoint => a streaming checkpoint dir arms the " +
        "lag alert for that consumer)",
      Seq(in("path", StringType),
        inDefault("retain_versions", IntegerType, "2"),
        inDefault("min_age_ms", LongType, "86400000"),
        inDefault("dry_run", BooleanType, "false"),
        inDefault("reader_floor_checkpoint", StringType, "NULL")),
      StructType(Seq(
        StructField("removed", StringType, nullable = false)))) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val floor =
          if (a.isNullAt(4)) None
          else Some(graft.streaming.TxLogSource.committedReaderFloor(s,
            a.getString(4).toString))
        TxLog.vacuum(a.getString(0).toString, a.getInt(1), a.getLong(2),
          dryRun = a.getBoolean(3), readerFloor = floor).map(f => row(f))
      }
    },

    new Proc("compact",
      "rewrite small files into large ones (OPTIMIZE); DV-aware, " +
        "partition-pure on partitioned tables; sort_columns " +
        "(comma-separated, e.g. a Z-order key) clusters the rewrite " +
        "(OPTIMIZE ... ZORDER BY)",
      Seq(in("path", StringType),
        inDefault("max_file_bytes", LongType, (32L * 1024 * 1024).toString),
        inDefault("target_files", IntegerType, "1"),
        inDefault("sort_columns", StringType, "''")),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false)))) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val sortCols = a.getString(3).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.compact(s, path, v, a.getLong(1), a.getInt(2), sortCols))
        row(snap.version, snap.files.size.toLong) :: Nil
      }
    },

    new Proc("restore",
      "roll the table back to a retained version as a NEW commit",
      Seq(in("path", StringType), in("version", LongType)),
      versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.restore(path, a.getLong(1), v))
        row(snap.version) :: Nil
      }
    },

    new Proc("delete_partitions",
      "metadata-only DELETE of whole partitions (predicate over " +
        "partition columns, SQL text)",
      Seq(in("path", StringType), in("predicate", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_removed_files", LongType, nullable = false)))) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val cond = expr(a.getString(1).toString)
        var removed = 0L
        val snap = TxLog.commitWithRetry(path) { v =>
          removed = TxLog.snapshot(path, Some(v)).files.size.toLong
          val after = TxLog.deletePartitions(s, path, cond, v)
          removed -= after.files.size
          after
        }
        row(snap.version, removed) :: Nil
      }
    },

    new Proc("purge_deletes",
      "materialize every active deletion vector (REORG APPLY PURGE)",
      Seq(in("path", StringType)), versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.purgeDeletes(s, path, v))
        row(snap.version) :: Nil
      }
    },

    new Proc("clone",
      "zero-copy clone of a snapshot into a new independent table " +
        "(hard links; survives source vacuums)",
      Seq(in("path", StringType), in("target", StringType),
        inDefault("version", LongType, "NULL")),
      StructType(Seq(
        StructField("source_version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false)))) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val src = a.getString(0).toString
        val dst = a.getString(1).toString
        val asOf = if (a.isNullAt(2)) None else Some(a.getLong(2))
        val snap = TxLog.cloneTable(src, dst, asOf)
        // the cloned source version from the clone's OWN commit record
        // (its CLONE commitInfo stamped it) — re-reading the source head
        // here could race a concurrent source commit and report a version
        // the clone does not serve
        val recorded = TxLog.commitInfos(dst)
          .find(_.operation.contains("CLONE"))
          .flatMap(_.params.get("sourceVersion")).map(_.toLong)
        // never report a sentinel: the clone's own CLONE commitInfo is
        // authoritative; when it cannot be found (and no asOf pins one)
        // the clone still SUCCEEDED - fail the report loudly instead of
        // emitting a nonsense version
        val srcVersion = recorded.orElse(asOf).getOrElse(
          throw new IllegalStateException(
            s"graft clone: $dst records no CLONE commitInfo with a " +
              "sourceVersion - the clone itself succeeded but its source " +
              "version cannot be reported; inspect TxLog.history(dst)"))
        row(srcVersion, snap.files.size.toLong) :: Nil
      }
    },

    new Proc("delete_where",
      "row-level DELETE (rewrites only touched files; SQL predicate)",
      Seq(in("path", StringType), in("predicate", StringType)),
      versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val cond = expr(a.getString(1).toString)
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.deleteWhere(s, path, cond, v))
        Seq(row(snap.version))
      }
    },

    new Proc("delete_where_dv",
      "soft DELETE by deletion vector (zero data-file churn until purge)",
      Seq(in("path", StringType), in("predicate", StringType)),
      versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val cond = expr(a.getString(1).toString)
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.deleteWhereDV(s, path, cond, v))
        Seq(row(snap.version))
      }
    },

    new Proc("update_where",
      "row-level UPDATE ... SET via deletion vector (old images " +
        "soft-delete, new images append, one commit); assignments as " +
        "map(column, expression)",
      Seq(in("path", StringType), in("predicate", StringType),
        in("assignments", MapType(StringType, StringType))),
      versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val cond = expr(a.getString(1).toString)
        val m = a.getMap(2)
        val set = (0 until m.numElements()).map { i =>
          m.keyArray().getUTF8String(i).toString ->
            expr(m.valueArray().getUTF8String(i).toString)
        }.toMap
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.updateWhereDV(s, path, cond, set, v))
        Seq(row(snap.version))
      }
    },

    new Proc("merge_into",
      "keyed MERGE: rows of the SOURCE (a table/view name resolvable in " +
        "the session) replace same-keyed rows of the table via deletion " +
        "vectors; key_columns comma-separated",
      Seq(in("path", StringType), in("source", StringType),
        in("key_columns", StringType)),
      versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val src = s.table(a.getString(1).toString)
        val keys = a.getString(2).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(keys.nonEmpty,
          "graft.merge_into: key_columns must name at least one column")
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.replaceWhereKeysDV(s, path, src.select(keys.map(
            org.apache.spark.sql.functions.col): _*), keys, src, v))
        Seq(row(snap.version))
      }
    },

    new Proc("add_column",
      "metadata-only ADD COLUMN (no data rewrite): existing rows read " +
        "back NULL until writes materialize it; type is a Spark DDL " +
        "string (e.g. 'BIGINT', 'ARRAY<STRING>')",
      Seq(in("path", StringType), in("name", StringType),
        in("type", StringType)), versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val dt = org.apache.spark.sql.types.DataType
          .fromDDL(a.getString(2).toString)
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.addColumn(s, path, a.getString(1).toString, dt, v))
        Seq(row(snap.version))
      }
    },

    new Proc("rename_column",
      "metadata-only column RENAME (column mapping - zero data rewrite); " +
        "refuses partition and constraint-referenced columns",
      Seq(in("path", StringType), in("from", StringType),
        in("to", StringType)), versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.renameColumn(path, a.getString(1).toString,
            a.getString(2).toString, v))
        Seq(row(snap.version))
      }
    },

    new Proc("drop_column",
      "metadata-only column DROP (physical name tombstoned - a re-added " +
        "same-named column reads NULL for old rows, never the dropped " +
        "values)",
      Seq(in("path", StringType), in("name", StringType)), versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.dropColumn(path, a.getString(1).toString, v))
        Seq(row(snap.version))
      }
    },

    new Proc("add_constraint",
      "add a named CHECK constraint (existing rows must already satisfy it)",
      Seq(in("path", StringType), in("name", StringType),
        in("check", StringType)), versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.addConstraint(s, path, a.getString(1).toString,
            a.getString(2).toString, v))
        row(snap.version) :: Nil
      }
    },

    new Proc("drop_constraint",
      "drop a named CHECK constraint",
      Seq(in("path", StringType), in("name", StringType)), versionOut) {
      def run(a: InternalRow, s: SparkSession): Seq[InternalRow] = {
        val path = a.getString(0).toString
        val snap = TxLog.commitWithRetry(path)(v =>
          TxLog.dropConstraint(path, a.getString(1).toString, v))
        row(snap.version) :: Nil
      }
    }

  ).map(p => p.name() -> (p: UnboundProcedure)).toMap
}
