package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension type 2 builder.
  *
  * Reference semantics (Meta_Guideline.md:2600-2687 initial load,
  * :2618-2659 incremental merge; requirements/...:79-99, 109):
  *   - versions keyed by natural key, ordered by a change timestamp;
  *   - `effective_start_ts` = version's change ts,
  *     `effective_end_ts` = next version's ts (exclusive) or HIGH_TS,
  *     `is_current` = end == HIGH_TS;
  *   - invariants: per NK, intervals are non-overlapping and contiguous,
  *     exactly one `is_current` row.
  *
  * Initial load = lag() change detection + lead() close-out — two window
  * passes over ONE shuffle (both windows share partitioning on the NK, so
  * Catalyst reuses the Exchange). Incremental = end-date join + union, the
  * reference's J5 (no Delta Lake in this environment, so the join-union
  * formulation is the portable one; on a Delta-enabled cluster `MERGE INTO`
  * is the drop-in replacement).
  */
object Scd2 {

  val HighTs = "9999-12-31 00:00:00"

  /** Build SCD2 history from a raw change log.
    *
    * @param changes  one row per observed state (may contain consecutive
    *                 duplicates — rows where no tracked attribute changed
    *                 are dropped via lag() comparison)
    * @param nk       natural-key columns
    * @param orderCol change-timestamp column name
    * @param attrs    tracked attribute columns (change in any ⇒ new version)
    */
  /** @param tiebreak extra ordering columns for observations sharing a
    *                  change timestamp — REQUIRED for deterministic version
    *                  selection whenever (nk, orderCol) isn't unique.
    */
  def initialLoad(
      changes: DataFrame,
      nk: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tiebreak: Seq[String] = Nil
  ): DataFrame = {
    val ordering = (orderCol +: tiebreak).map(col)
    val w = Window.partitionBy(nk.map(col): _*).orderBy(ordering: _*)

    // W2 — change detection: keep first row per NK + rows where any tracked
    // attribute differs from its lag. Null-safe equality so null→value and
    // value→null transitions register as changes.
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val versions = changes
      .withColumn("__is_change", lag(col(orderCol), 1).over(w).isNull || changed)
      .filter(col("__is_change"))
      .drop("__is_change")

    // W3 — interval close-out: lead() with HIGH_TS default.
    close(versions, nk, orderCol, tiebreak)
  }

  /** Recompute end timestamps + is_current for a set of versions whose
    * `effective_start_ts` is `orderCol`. Type-preserving: works for both
    * TIMESTAMP and TIMESTAMP_NTZ order columns.
    */
  private def close(versions: DataFrame, nk: Seq[String], orderCol: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(nk.map(col): _*)
      .orderBy((orderCol +: tiebreak).map(col): _*)
    val high = lit(HighTs).cast(versions.schema(orderCol).dataType)
    val next = lead(col(orderCol), 1).over(w)
    versions
      .withColumn("effective_start_ts", col(orderCol))
      .withColumn("effective_end_ts", coalesce(next, high))
      .withColumn("is_current", next.isNull)
  }

  /** Incremental merge: fold a new batch of changes into an existing SCD2
    * table (reference J5, Meta_Guideline.md:2618-2659 — end-date matched
    * current rows, append new versions).
    *
    * Implementation: rebuild per-NK history only for keys present in the
    * batch (left_semi restriction keeps the recompute proportional to the
    * batch, not the dimension), union with untouched keys. This sidesteps
    * the reference's fragile max(effective_start_ts) comparison (SURVEY
    * §7.4.1) while preserving its observable semantics.
    */
  /** The increment in the shape a transactional `MERGE INTO` consumes
    * (see [[DimStore]]): the COMPLETE rebuilt history for every natural
    * key the batch touches, plus the touched-key set. Primary key of an
    * upsert row = (nk, effective_start_ts); rows for untouched keys never
    * appear, so a merge-capable store modifies O(batch-keys' versions)
    * rows, not O(dimension).
    */
  final case class Scd2Delta(upserts: DataFrame, touchedKeys: DataFrame)

  def incrementalDelta(
      existing: DataFrame,
      batch: DataFrame,
      nk: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tiebreak: Seq[String] = Nil
  ): Scd2Delta = {
    val touchedKeys = batch.select(nk.map(col): _*).distinct()
    val touchedOld = existing
      .join(touchedKeys, nk, "left_semi")
      .select((nk :+ orderCol).map(col) ++ attrs.map(col): _*)
    val combined =
      touchedOld.unionByName(batch.select((nk :+ orderCol).map(col) ++ attrs.map(col): _*))
    Scd2Delta(initialLoad(combined, nk, orderCol, attrs, tiebreak), touchedKeys)
  }

  def incrementalMerge(
      existing: DataFrame,
      batch: DataFrame,
      nk: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tiebreak: Seq[String] = Nil
  ): DataFrame = {
    val delta = incrementalDelta(existing, batch, nk, orderCol, attrs, tiebreak)
    existing.join(delta.touchedKeys, nk, "left_anti").unionByName(delta.upserts)
  }

  /** Append the Unknown member (SK=0 — requirements/...:87, 111; the
    * copilot doc's -1 is the documented outlier, SURVEY §7.4.7).
    */
  def withUnknownRow(dim: DataFrame, unknown: DataFrame): DataFrame =
    unknown.unionByName(dim, allowMissingColumns = false)

  /** Point-in-time lookup: attach to each fact row the dimension version
    * that was effective at the fact's timestamp — the query-side complement
    * of the SCD2 builders above (the reference reads its SCD2 dims exactly
    * this way when attributing facts to historical attribute values).
    *
    * Semantics: left join on the natural key with
    * `startCol <= factTs < endCol`. SCD2 invariants (non-overlapping
    * intervals per NK) guarantee at most one match per fact row, so the
    * output is deterministic and row-count-preserving; facts that predate
    * the first version keep NULL dimension attributes.
    *
    * Scale shape: the EQUALITY predicate on the natural key is part of the
    * join condition, so Catalyst plans a hash/sort-merge join partitioned by
    * NK (or a broadcast-hash join for a small dim) and evaluates the range
    * bounds as a residual — never a nested-loop range join. Versions per key
    * are few (dim-scale), so the per-key match work is O(versions). A spec
    * asserts the plan contains no BroadcastNestedLoopJoin/CartesianProduct.
    *
    * @param facts  fact rows; ALL fact columns are preserved
    * @param dim    SCD2 dimension (NK + attribute + interval columns)
    * @param nk     natural-key columns (same names on both sides)
    * @param factTs fact timestamp column to probe with
    * @return facts with the dim's non-NK columns appended (NULL if no
    *         version covers `factTs`)
    */
  def pointInTimeLookup(
      facts: DataFrame,
      dim: DataFrame,
      nk: Seq[String],
      factTs: String,
      startCol: String = "effective_start_ts",
      endCol: String = "effective_end_ts"
  ): DataFrame = {
    val f = facts.alias("__pit_f")
    val d = dim.alias("__pit_d")
    val keyEq = nk.map(k => col(s"__pit_f.$k") === col(s"__pit_d.$k")).reduce(_ && _)
    val inRange = col(s"__pit_f.$factTs") >= col(s"__pit_d.$startCol") &&
      col(s"__pit_f.$factTs") < col(s"__pit_d.$endCol")
    val dimAttrs = dim.columns.filterNot(nk.contains).toSeq
    val collisions = facts.columns.toSeq.intersect(dimAttrs)
    require(collisions.isEmpty,
      s"pointInTimeLookup: dim attribute column(s) ${collisions.mkString(", ")} " +
        "collide with fact columns — rename them on one side before the lookup " +
        "(the appended output would otherwise carry duplicate column names)")
    f.join(d, keyEq && inRange, "left")
      .select(facts.columns.toSeq.map(c => col(s"__pit_f.$c")) ++
        dimAttrs.map(c => col(s"__pit_d.$c")): _*)
  }
}
