package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change-data-capture: classify every key across two snapshots of
  * a keyed table as insert / delete / update / unchanged — the bronze-layer
  * "what changed since the last load" primitive for sources that can only
  * hand over full snapshots, no change log (the reference re-ingests full
  * extracts per run_date and derives deltas downstream;
  * reference Meta_Guideline.md:905-960 ingest contract).
  *
  * Plan shape: ONE full-outer shuffle join on the key — both sides
  * partition by the same key, so at 100 TB this is a single co-partitioned
  * pass; no window, no skew-prone global ordering. Attribute change
  * detection is null-safe per column (`<=>`), so value→NULL and NULL→value
  * transitions register as updates.
  */
object SnapshotDiff {

  /** @param before  previous snapshot
    * @param after   current snapshot
    * @param keys    primary-key columns (same names both sides)
    * @param attrs   tracked attribute columns; a null-safe difference in any
    *                of them marks the row `update`
    * @param includeUnchanged keep `unchanged` rows (default false — at scale
    *                the unchanged class is ~the whole table; emit only deltas)
    * @return one row per changed key: keys, the surviving attribute values
    *         (after-image; before-image for deletes), and `change_type`
    */
  def diff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      includeUnchanged: Boolean = false
  ): DataFrame = {
    val b = before.select((keys ++ attrs).map(col): _*)
      .withColumn("__b", lit(true)).alias("__sd_b")
    val a = after.select((keys ++ attrs).map(col): _*)
      .withColumn("__a", lit(true)).alias("__sd_a")
    // null-safe: a NULL key value is matched across snapshots (one NULL-key
    // row max, like any PK value) instead of spuriously reading as
    // delete+insert — which would then break applyDiff's round-trip
    val keyEq = keys.map(k => col(s"__sd_b.$k") <=> col(s"__sd_a.$k")).reduce(_ && _)
    val changed = attrs
      .map(c => !(col(s"__sd_b.$c") <=> col(s"__sd_a.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val joined = b.join(a, keyEq, "full_outer")
    val tagged = joined.select(
      keys.map(k => coalesce(col(s"__sd_a.$k"), col(s"__sd_b.$k")).as(k)) ++
        attrs.map(c =>
          when(col("__sd_a.__a").isNotNull, col(s"__sd_a.$c"))
            .otherwise(col(s"__sd_b.$c")).as(c)) :+
        when(col("__sd_b.__b").isNull, "insert")
          .when(col("__sd_a.__a").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged").as("change_type"): _*)
    if (includeUnchanged) tagged else tagged.filter(col("change_type") =!= "unchanged")
  }

  /** Apply a diff (as produced by `diff`) to the base snapshot: replace
    * updated keys, drop deleted keys, add inserts — reconstructing the
    * after-image. `applyDiff(before, diff(before, after)) == after` is the
    * round-trip invariant (spec + oracle proven): the mirror-maintenance
    * merge for targets without MERGE INTO.
    *
    * `base` must carry exactly the key + tracked attribute columns the diff
    * was computed over. One left_anti shuffle on the key + a union — the
    * same co-partitioned single-pass shape as `diff`.
    */
  def applyDiff(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val touched = delta.select(keys.map(col): _*).distinct().alias("__sd_t")
    val b = base.alias("__sd_base")
    // null-safe anti join, matching diff(): a NULL-key base row replaced or
    // deleted by the delta must actually leave
    val keyEq = keys.map(k => col(s"__sd_base.$k") <=> col(s"__sd_t.$k")).reduce(_ && _)
    b.join(touched, keyEq, "left_anti")
      .unionByName(
        delta.filter(col("change_type") =!= "delete").drop("change_type"))
  }
}
