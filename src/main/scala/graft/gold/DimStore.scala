package graft.gold

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Storage seam for publishing SCD2 dimension increments.
  *
  * The engine's portable publish is a FULL REWRITE (plain parquet — the
  * reference publishes its dims the same way, Meta_Guideline.md:2618-2659),
  * but at 10¹⁰-row dimensions a per-batch O(dimension) rewrite is the first
  * thing a real deployment replaces with a transactional `MERGE INTO`
  * (Delta/Iceberg/Hudi). Those table formats are environment-blocked here
  * (SCALING.md §ACID: the offline coursier cache ships no lakehouse
  * artifacts), so this seam pins the CONTRACT now, making the lakehouse
  * drop-in a matter of configuration, not surgery:
  *
  *  - [[graft.gold.Scd2.incrementalDelta]] factors the increment into the
  *    exact shape `MERGE INTO` consumes: the rebuilt version rows for
  *    touched natural keys (`upserts`) + the touched-key set;
  *  - [[RewriteDimStore]] is the portable production implementation
  *    (untouched ∪ upserts, atomic tmp+rename swap);
  *  - [[InMemoryMergeDimStore]] is a test double executing the literal
  *    three-clause merge a lakehouse engine would run:
  *    {{{
  *    MERGE INTO dim t USING upserts s
  *      ON t.<nk> = s.<nk> AND t.<startCol> = s.<startCol>
  *      WHEN MATCHED                    THEN UPDATE SET *
  *      WHEN NOT MATCHED                THEN INSERT *
  *      WHEN NOT MATCHED BY SOURCE
  *        AND t.<nk> IN (touched keys)  THEN DELETE
  *    }}}
  *    (the DELETE clause reaps version rows that a re-dedup collapsed).
  *    `Scd2MergeSeamSpec` drives random change sequences through both
  *    stores and asserts identical dim states, plus the O(batch) bound on
  *    rows the merge path touches.
  */
trait DimStore {
  def read(): DataFrame

  /** Publish one incremental batch. `delta.upserts` carries the complete
    * rebuilt history for every touched natural key; `startCol` is the
    * version-identifying column (primary key = nk + startCol).
    */
  def publish(delta: Scd2.Scd2Delta, nk: Seq[String], startCol: String): Unit
}

object DimStore {

  val StoreKey = "spark.graft.scd2.store"

  /** Format-flag factory: `spark.graft.scd2.store` selects the publish
    * implementation. `rewrite` (default) is the portable parquet path;
    * `delta`/`iceberg`/`hudi` fail with a named error until the
    * environment ships the jars — the merge contract those would use is
    * already pinned by the in-memory double.
    */
  def forPath(spark: SparkSession, path: String): DimStore =
    spark.conf.get(StoreKey, "rewrite") match {
      case "rewrite" => new RewriteDimStore(spark, path)
      case "merge"   => new ParquetMergeDimStore(spark, path)
      case "txlog"   => new TxLogDimStore(spark, path)
      case f @ ("delta" | "iceberg" | "hudi") =>
        throw new IllegalArgumentException(
          s"$StoreKey=$f: transactional MERGE INTO targets are " +
            "environment-blocked (no lakehouse artifacts in the offline " +
            "cache - SCALING.md s.ACID). The merge-path contract is pinned " +
            "by InMemoryMergeDimStore + Scd2MergeSeamSpec; dropping in a " +
            "Delta jar makes this a config change, not surgery.")
      case other =>
        throw new IllegalArgumentException(
          s"$StoreKey=$other: expected 'rewrite', 'merge', or 'txlog' (or " +
            "a lakehouse format once the environment ships one)")
    }
}

/** TRANSACTIONAL dimension store over the own commit log
  * (`spark.graft.scd2.store=txlog`): each publish is ONE atomic
  * [[TxLog.replaceWhereKeys]] commit — remove every version row of a
  * touched natural key, add the rebuilt history — so readers see either
  * the pre-merge or the post-merge dimension, never a state with touched
  * keys missing; concurrent publishers conflict loudly (optimistic
  * concurrency); and every historical dimension state stays time-travel
  * readable. Only files CONTAINING touched keys are rewritten — with a
  * key-clustered layout that is O(batch) I/O, the bound the MERGE seam
  * exists to deliver. This closes the seam's loop end-to-end: the
  * three-clause contract (InMemoryMergeDimStore), the distributed
  * bookkeeping (ParquetMergeDimStore), and now a commit protocol
  * underneath it.
  */
final class TxLogDimStore(spark: SparkSession, path: String) extends DimStore {

  /** The version the LAST `read()` served — the optimistic-concurrency
    * token a subsequent `publish` must carry. Capturing it at read time
    * (not at publish time) is what makes the token meaningful: the delta
    * was computed against THIS snapshot, so any commit interleaved between
    * read and publish raises ConflictException instead of silently
    * clobbering state the publisher never saw (the lost update the commit
    * log exists to prevent).
    */
  @volatile private var readVersion: Option[Long] = None

  def init(dim: DataFrame): Unit = {
    val s = TxLog.init(dim, path)
    readVersion = Some(s.version)
  }

  override def read(): DataFrame = {
    val snap = TxLog.snapshot(path)
    readVersion = Some(snap.version)
    TxLog.read(spark, path, asOf = Some(snap.version))
  }

  override def publish(delta: Scd2.Scd2Delta, nk: Seq[String],
      startCol: String): Unit = {
    val v = readVersion.getOrElse(
      throw new IllegalStateException(
        s"TxLogDimStore: no snapshot version captured for $path - call " +
          "read() (or init) before computing the delta you publish"))
    val cols = TxLog.read(spark, path, asOf = Some(v)).columns
    TxLog.replaceWhereKeys(spark, path, delta.touchedKeys, nk,
      delta.upserts.select(cols.map(org.apache.spark.sql.functions.col): _*),
      expectedVersion = v)
    // a second publish from the SAME read would build on state it never
    // saw — require a fresh read() (whose snapshot includes this commit)
    readVersion = None
  }
}

/** DISTRIBUTED three-clause merge over parquet-backed state — the
  * production-shaped counterpart of [[InMemoryMergeDimStore]] for
  * dimensions that outgrow the driver (`spark.graft.scd2.store=merge`).
  * State never touches driver memory: every clause is a key-bounded join —
  *
  *  - clause 4 (untouched): `state ANTI-JOIN touchedKeys` on nk;
  *  - WHEN MATCHED / NOT MATCHED: the upserts frame IS the post-merge
  *    content for every touched key, so the result is
  *    `untouched UNION upserts` — identical rows to replaying
  *    UPDATE/INSERT/DELETE one by one (Scd2MergeSeamSpec proves all three
  *    stores bit-equal on random sequences);
  *  - `lastTouchedRows` (the O(batch) seam property) is computed
  *    DISTRIBUTED: updates = touched state rows whose pk matches an upsert
  *    with any attribute changed, deletes = touched state rows with no pk
  *    match, inserts = upserts with no pk match — all joins restricted to
  *    the touched-key slice, so counting costs O(batch), not O(dim).
  *
  * The physical publish is still a parquet rewrite (plain parquet has no
  * sub-file update); what this store changes is WHERE the merge state and
  * bookkeeping live. A lakehouse format would swap only the final write.
  */
final class ParquetMergeDimStore(spark: SparkSession, path: String)
    extends DimStore {

  /** update + insert + delete row count of the most recent publish. */
  var lastTouchedRows: Long = 0L

  def init(dim: DataFrame): Unit = {
    dim.write.mode("overwrite").parquet(path)
    lastTouchedRows = read().count()
  }

  override def read(): DataFrame = spark.read.parquet(path)

  override def publish(delta: Scd2.Scd2Delta, nk: Seq[String],
      startCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, struct}
    val state = read()
    val fields = state.columns.toSeq
    val pk = nk :+ startCol
    val ups = delta.upserts.select(fields.map(col): _*)
    val touchedState = state.join(delta.touchedKeys, nk, "left_semi")
    val attrs = fields.filterNot(pk.contains)
    // all bookkeeping joins are <=> (null-safe): a NULL-valued pk
    // component must match itself, or the row is double-counted as
    // delete+insert instead of update/no-op
    val pkEq = (l: String, r: String) =>
      pk.map(k => col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)
    // WHEN MATCHED: pk present both sides; count only rows that actually
    // change (UPDATE SET * on an identical row is a no-op)
    val updates = touchedState.as("t")
      .join(ups.as("s"), pkEq("t", "s"))
      .filter(!(struct(attrs.map(a => col(s"t.$a")): _*) <=>
        struct(attrs.map(a => col(s"s.$a")): _*)))
      .count()
    val deletes = touchedState.as("t")
      .join(ups.as("s"), pkEq("t", "s"), "left_anti").count()
    // upsert pks lie within the touched-key slice, so probing touchedState
    // (not the full state) keeps the count O(batch) as documented
    val inserts = ups.as("s")
      .join(touchedState.as("t"), pkEq("s", "t"), "left_anti").count()
    lastTouchedRows = updates + deletes + inserts
    val next = state.join(delta.touchedKeys, nk, "left_anti").unionByName(ups)
    RewriteDimStore.atomicSwap(spark, path, next)
  }
}

/** Portable production store: plain parquet, full-state publish via the
  * same write-to-temp + rename swap as Compaction (and with the same
  * single-writer / no-concurrent-reader window contract).
  */
final class RewriteDimStore(spark: SparkSession, path: String) extends DimStore {

  override def read(): DataFrame = spark.read.parquet(path)

  /** Seed the store with an initial dim state (first load). */
  def init(dim: DataFrame): Unit =
    dim.write.mode("overwrite").parquet(path)

  override def publish(delta: Scd2.Scd2Delta, nk: Seq[String],
      startCol: String): Unit = {
    val untouched = read().join(delta.touchedKeys, nk.toSeq, "left_anti")
    val next = untouched.unionByName(delta.upserts)
    RewriteDimStore.atomicSwap(spark, path, next)
  }
}

object RewriteDimStore {

  /** Write `next` to a temp dir and swap it into `path` without ever
    * holding zero copies of the state (shared by the rewrite and
    * parquet-merge stores; same contract as Compaction's swap).
    */
  private[gold] def atomicSwap(spark: SparkSession, path: String,
      next: DataFrame): Unit = {
    val tmp = path.stripSuffix("/") + ".__dim_tmp"
    next.write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".__dim_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(dst, bak))
      throw new java.io.IOException(s"DimStore: could not stage $path aside")
    try {
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
        throw new java.io.IOException(s"DimStore: could not publish $tmp")
    } catch {
      case publishFailure: Throwable =>
        val restored =
          try fs.rename(bak, dst)
          catch { case _: Throwable => false }
        if (!restored)
          throw new java.io.IOException(
            s"DimStore: publish failed AND restore failed - original data " +
              s"is intact at $bak; rename it back to $path manually",
            publishFailure)
        throw publishFailure
    }
    fs.delete(bak, true)
  }
}

/** `MERGE INTO`-shaped test double: dimension state lives in driver memory
  * and each publish applies the three merge clauses as row operations —
  * update matched versions, insert new versions, delete touched-key
  * versions absent from the rebuilt history. `lastTouchedRows` records how
  * many rows the merge actually modified, pinning the O(batch) property
  * that motivates the seam.
  */
final class InMemoryMergeDimStore(spark: SparkSession,
    schema: org.apache.spark.sql.types.StructType) extends DimStore {

  private var state: Vector[Row] = Vector.empty

  /** update + insert + delete row count of the most recent publish. */
  var lastTouchedRows: Long = 0L

  def init(dim: DataFrame): Unit = {
    state = dim.collect().toVector
    lastTouchedRows = state.size.toLong
  }

  override def read(): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(new java.util.ArrayList[Row](state.asJava), schema)
  }

  override def publish(delta: Scd2.Scd2Delta, nk: Seq[String],
      startCol: String): Unit = {
    val fields = schema.fieldNames.toSeq
    def nkOf(r: Row): Seq[Any] = nk.map(k => r.get(fields.indexOf(k)))
    def pkOf(r: Row): Seq[Any] = nkOf(r) :+ r.get(fields.indexOf(startCol))

    // project upserts to the store's column ORDER (merge is name-based)
    val ups = delta.upserts.selectExpr(fields.map(f => s"`$f`"): _*).collect()
    val touched = delta.touchedKeys.collect()
      .map(r => delta.touchedKeys.columns.toSeq.map(c =>
        r.get(delta.touchedKeys.columns.indexOf(c)))).toSet
    val upByPk = ups.map(r => pkOf(r) -> r).toMap
    require(upByPk.size == ups.length,
      "InMemoryMergeDimStore: upserts carry duplicate (nk, startCol) " +
        "primary keys - the merge ON clause would be ambiguous")

    var updates = 0L
    var deletes = 0L
    val kept = Vector.newBuilder[Row]
    val matchedPks = scala.collection.mutable.Set.empty[Seq[Any]]
    state.foreach { r =>
      if (!touched(nkOf(r))) kept += r // untouched key: clause 4 = no-op
      else upByPk.get(pkOf(r)) match {
        case Some(s) => // WHEN MATCHED: UPDATE SET *
          matchedPks += pkOf(r)
          if (s != r) updates += 1
          kept += s
        case None => // WHEN NOT MATCHED BY SOURCE (touched): DELETE
          deletes += 1
      }
    }
    // WHEN NOT MATCHED: INSERT *
    val inserts = ups.filterNot(s => matchedPks(pkOf(s)))
    inserts.foreach(kept += _)
    state = kept.result()
    lastTouchedRows = updates + deletes + inserts.length
  }
}
