package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest deduplication — the reference's core Silver operator
  * (Meta_Guideline.md:1608-1617 users, :1752-1761 datasets, :1974-1979 tags;
  * pattern doc .github/copilot-instructions.md:206-211).
  *
  * `row_number() OVER (PARTITION BY nk ORDER BY ...desc) == 1`.
  *
  * Scale notes: the window shuffles once on the natural key — same cost as
  * any grouped operator, no skew beyond key skew (mitigate with AQE skew
  * handling, already on in GraftSession). `row_number` + filter(rn=1)
  * executes as a single WindowExec after one Exchange; at 100 TB this is the
  * minimal-shuffle formulation (a groupBy(max(struct(...))) alternative has
  * identical shuffle shape but loses `desc_nulls_last` composability).
  */
object Dedup {

  /** One row per key, picking the first row under `ordering`. Ordering must
    * be total per key for deterministic output — callers should append a
    * unique tiebreaker column (the reference relies on
    * `desc_nulls_last(completeness)` then implicit order; we make
    * determinism explicit).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Reference-shaped "keep latest by timestamp" with explicit tiebreak. */
  def keepLatest(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: Seq[Column] = Nil
  ): DataFrame =
    keepFirst(df, keys, col(tsCol).desc_nulls_last +: tiebreak)

  /** Exact duplicate removal on a column subset
    * (reference `dropDuplicates(["dataset_id","tag"])`, Meta_Guideline.md:1305).
    * Non-deterministic in which duplicate survives when other columns differ
    * — use `keepFirst` when that matters.
    */
  def dropDuplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)
}
