package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental distinct-count maintenance via mergeable HLL sketches
  * (Apache DataSketches, Spark-native `hll_*` functions).
  *
  * The additive path (`IncrementalAgg.mergeAdditive`) cannot maintain
  * COUNT(DISTINCT): distincts don't add. The warehouse answer is a
  * per-group SKETCH table — new batches build their own sketches and
  * merge by union, so maintenance cost is ∝ batch (never a rescan), the
  * store stays one bounded row per group (a sketch is ≤ ~2^lgK bytes),
  * and estimates are always serveable. HLL union is register-wise max,
  * so merging per-batch sketches loses nothing an all-at-once build had:
  * `SketchDistinctSpec` bounds both against the exact counts.
  *
  * The estimate is approximate, hence NO DuckDB oracle (its
  * approx_count_distinct is a different algorithm); the algebra is
  * spec-proven instead — same posture as `q_a4b_approx_distinct`.
  *
  * Estimator subtlety (spec-pinned): a never-unioned sketch serves
  * DataSketches' HIP estimator, a union result serves the composite
  * estimator — identical registers, estimates can differ by ±1 count.
  * A maintained store is always post-union, so its estimates are
  * self-consistent; just don't expect byte/estimate equality between a
  * one-shot `buildSketches` and an incrementally merged store.
  */
object SketchDistinct {

  /** Per-group HLL sketch of `valueCol`. `lgK` trades accuracy for size
    * (default 12 → ~1.6% RSE, ≤ 4 KB per group).
    */
  def buildSketches(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = 12
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge a batch's sketches into the store: union by group key — one
    * shuffle of sketch rows (group-cardinality scale, not data scale).
    * Groups new to either side pass through; HLL union is idempotent and
    * commutative, so replaying a batch (at-least-once delivery) cannot
    * inflate the estimate.
    */
  def merge(store: DataFrame, batchSketches: DataFrame, groupCols: Seq[String]): DataFrame =
    store.unionByName(batchSketches)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Serveable estimates from the store. */
  def estimates(store: DataFrame): DataFrame =
    store.withColumn("approx_distinct", hll_sketch_estimate(col("sketch")))
}
