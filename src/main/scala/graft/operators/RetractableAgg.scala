package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance UNDER DELETES — the half of view
  * maintenance [[IncrementalAgg.mergeAdditive]] (inserts only) and
  * `gold.SketchDistinct` (mergeable HLL, cannot retract) leave open.
  *
  * Classic incremental-view-maintenance treatment, measure by measure:
  *
  *  - COUNT/SUM are groups (not just monoids): a delete batch applies as
  *    a negative delta — O(batch) always.
  *  - MIN/MAX cannot retract (removing the minimum reveals an unknown
  *    second-smallest), so deletes that TOUCH a stored extremum mark the
  *    group AFFECTED and only those groups re-aggregate from the
  *    maintained base — O(affected groups' rows), not O(history). The
  *    affected test is conservative (deleted min ≤ current min), which
  *    only ever recomputes a superset.
  *  - COUNT(DISTINCT) retracts exactly through a value-level REFERENCE
  *    COUNT store ((keys, value) → multiplicity): a delete decrements,
  *    a value's row disappears at zero, distinct = store rows per group.
  *    This is the exact delete-capable complement of the HLL sketch
  *    store — priced at one store row per live (group, value) pair.
  *
  * The group-existence question deletes raise ("did the last row of this
  * group go away?") is answered by the mandatory per-group COUNT column —
  * the support column of the view-maintenance literature. Groups whose
  * count reaches zero vanish, exactly like a full recompute.
  *
  * Scale shape: batch aggregations are map-side-combined shuffles on the
  * batch; the merge joins shuffle |groups| rows; the recompute scans only
  * affected groups via a null-safe semi join. The gated queries
  * (`q_o_retractable_agg`, `q_o_retractable_distinct`) check the defining
  * invariant: maintained result ≡ full recompute over base∪inserts∖deletes,
  * via the DuckDB oracle.
  */
object RetractableAgg {

  private def nullSafeOn(l: String, r: String, keys: Seq[String]): Column =
    keys.map(k => col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)

  /** Build the stored aggregate this module maintains: per-group count +
    * additive sums + mins/maxs. `cnt` is load-bearing (group existence).
    */
  def buildAgg(base: DataFrame, keys: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame =
    base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sums.map(c => sum(col(c)).as(c)) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c")): _*)

  /** Fold an insert batch AND a delete batch into `stored`
    * (= buildAgg(oldBase)), given `newBase` = oldBase ∪ inserts ∖ deletes
    * for the affected-group recompute. Deleting rows that were never in
    * the base is undefined and GUARDED both ways: a group driven to a
    * negative count raises, and a delete group with no row in the
    * maintained aggregate raises (full-outer detection, not a silent
    * left-join no-op). Result ≡ buildAgg(newBase).
    */
  def applyChanges(
      stored: DataFrame,
      newBase: DataFrame,
      inserts: DataFrame,
      deletes: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil
  ): DataFrame = {
    // inserts extend the monoid side exactly as the insert-only operator
    val grown = IncrementalAgg.mergeAdditive(
      stored, buildAgg(inserts, keys, sums, mins, maxs),
      keys, sums = "cnt" +: sums,
      mins = mins.map(c => s"min_$c"), maxs = maxs.map(c => s"max_$c"))
    // deleted-batch aggregates: counts/sums retract; min/max only DETECT
    val delAgg = deletes.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sums.map(c => sum(col(c)).as(c)) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c")): _*)
      .select(keys.map(col) ++ (("cnt" +: sums).map(c => col(c).as(s"__d_$c")) ++
        mins.map(c => col(s"min_$c").as(s"__d_min_$c")) ++
        maxs.map(c => col(s"max_$c").as(s"__d_max_$c"))): _*)

    val g = grown.alias("__ra_g")
    val d = delAgg.alias("__ra_d")
    // each comparison coalesced to false: a NULL extremum on either side
    // (delete batch removed only NULL-valued rows, or the stored group is
    // all-NULL in that measure) must read "does not touch", not SQL NULL —
    // a NULL would poison the OR-fold and make __affected NULL, failing
    // BOTH downstream filters and silently dropping a live group
    val touchesExtremum = (
      mins.map(c => coalesce(col(s"__ra_d.__d_min_$c") <= col(s"__ra_g.min_$c"), lit(false))) ++
        maxs.map(c => coalesce(col(s"__ra_d.__d_max_$c") >= col(s"__ra_g.max_$c"), lit(false)))
    ).foldLeft(lit(false))(_ || _)
    // full_outer, not left_outer: a delete group absent from the maintained
    // aggregate must RAISE (the negative-count guard's never-seen sibling),
    // not silently no-op
    val joined = g.join(d, nullSafeOn("__ra_g", "__ra_d", keys), "full_outer")
      .select(
        keys.map(k => coalesce(col(s"__ra_g.$k"), col(s"__ra_d.$k")).as(k)) ++ Seq(
          when(col("__ra_g.cnt").isNull && col("__ra_d.__d_cnt").isNotNull,
            raise_error(lit(
              "RetractableAgg: delete batch references a group absent from " +
                "the maintained aggregate - deletes must be rows of the " +
                "maintained base")))
            .otherwise(col("__ra_g.cnt") - coalesce(col("__ra_d.__d_cnt"), lit(0L)))
            .as("cnt"),
          (col("__ra_d.__d_cnt").isNotNull && touchesExtremum).as("__affected")) ++
          sums.map { c =>
            when(col(s"__ra_g.$c").isNull && col(s"__ra_d.__d_$c").isNull, lit(null))
              .otherwise(coalesce(col(s"__ra_g.$c"), lit(0)) -
                coalesce(col(s"__ra_d.__d_$c"), lit(0))).as(c)
          } ++
          mins.map(c => col(s"__ra_g.min_$c").as(s"min_$c")) ++
          maxs.map(c => col(s"__ra_g.max_$c").as(s"max_$c")): _*)
      .withColumn("cnt",
        when(col("cnt") < 0, raise_error(concat(lit(
          "RetractableAgg: delete batch drove a group count negative - " +
            "deletes must be rows of the maintained base"))))
          .otherwise(col("cnt")))

    val unaffected = joined.filter(!col("__affected") && col("cnt") > 0)
      .drop("__affected")
    val affectedKeys = joined.filter(col("__affected"))
      .select(keys.map(col): _*)
    // recompute ONLY the affected groups from the maintained base; groups
    // fully deleted simply produce no rows, matching the full recompute
    val nb = newBase.alias("__ra_b")
    val ak = affectedKeys.alias("__ra_k")
    val recomputed = buildAgg(
      nb.join(ak, nullSafeOn("__ra_b", "__ra_k", keys), "left_semi"),
      keys, sums, mins, maxs)
    unaffected.unionByName(recomputed)
  }

  // -------------------------------------------------------------------------
  // Exact retractable COUNT(DISTINCT): value-level reference-count store
  // -------------------------------------------------------------------------

  /** (keys…, valueCol, ref_cnt) — one row per LIVE (group, value) pair.
    * NULL values are excluded, matching COUNT(DISTINCT)'s null semantics.
    */
  def buildDistinctStore(base: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    base.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("ref_cnt"))

  /** Fold insert + delete batches into the store: increments, decrements,
    * zero-count rows vanish, negative counts raise (a delete of a value
    * the base never held).
    */
  def maintainDistinctStore(
      store: DataFrame,
      inserts: DataFrame,
      deletes: DataFrame,
      keys: Seq[String],
      valueCol: String
  ): DataFrame = {
    val k = keys :+ valueCol
    val ins = buildDistinctStore(inserts, keys, valueCol)
      .withColumnRenamed("ref_cnt", "__ins_cnt")
    val del = buildDistinctStore(deletes, keys, valueCol)
      .withColumnRenamed("ref_cnt", "__del_cnt")
    val s = store.alias("__rd_s")
    val i = ins.alias("__rd_i")
    val d = del.alias("__rd_d")
    s.join(i, nullSafeOn("__rd_s", "__rd_i", k), "full_outer")
      .select(
        k.map(c => coalesce(col(s"__rd_i.$c"), col(s"__rd_s.$c")).as(c)) :+
          (coalesce(col("__rd_s.ref_cnt"), lit(0L)) +
            coalesce(col("__rd_i.__ins_cnt"), lit(0L))).as("ref_cnt"): _*)
      .alias("__rd_s")
      // full_outer, not left_outer: a delete of a (group, value) pair the
      // store never held must RAISE, not silently vanish from the fold
      .join(d, nullSafeOn("__rd_s", "__rd_d", k), "full_outer")
      .select(
        k.map(c => coalesce(col(s"__rd_s.$c"), col(s"__rd_d.$c")).as(c)) :+
          when(col("__rd_s.ref_cnt").isNull && col("__rd_d.__del_cnt").isNotNull,
            raise_error(lit(
              "RetractableAgg: delete batch references a (group, value) pair " +
                "absent from the distinct store - deletes must be rows of " +
                "the maintained base")))
            .otherwise(col("__rd_s.ref_cnt") -
              coalesce(col("__rd_d.__del_cnt"), lit(0L))).as("ref_cnt"): _*)
      .withColumn("ref_cnt",
        when(col("ref_cnt") < 0, raise_error(lit(
          "RetractableAgg: delete batch drove a value refcount negative - " +
            "deletes must be rows of the maintained base")))
          .otherwise(col("ref_cnt")))
      .filter(col("ref_cnt") > 0)
  }

  /** Per-group exact distinct counts from the store (every row is live). */
  def distinctCounts(store: DataFrame, keys: Seq[String]): DataFrame =
    store.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_distinct"))
}
