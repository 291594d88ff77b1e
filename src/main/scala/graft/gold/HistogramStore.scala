package graft.gold

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable fixed-edge histogram store — the QUANTILE member of the
  * maintained-statistics family (`IncrementalAgg` = additive measures,
  * `SketchDistinct` = distinct counts, `RetractableAgg` = delete-aware
  * exact aggregates).
  *
  * An exact percentile at warehouse scale is a full sort (or a
  * per-query `percentile` shuffle over all rows); `percentile_approx`'s
  * t-digest is neither a storable nor a mergeable artifact in SQL-land.
  * This store is both, by construction: deterministic integer bin edges
  * fixed at creation (`lo`, `hi`, `bins`), so a histogram is just a
  * sparse (group…, bucket, cnt) table —
  *
  *  - **mergeable**: counts add (union + sum), any batch split gives the
  *    same store as a one-shot build — bit-identical, not approximately;
  *  - **retractable**: a delete batch is a negative-weight delta (same
  *    algebra as [[graft.operators.RetractableAgg]] counts; zero-count
  *    buckets vanish, negative counts raise);
  *  - **serveable**: any rank/quantile query runs over ≤ bins+2 rows per
  *    group and returns EXACT bracketing bounds `[lo_bound, hi_bound]`
  *    for the true quantile — a certainty interval, not an estimate
  *    (width = bin width; tighten by raising `bins`).
  *
  * Everything is exact integer arithmetic (ppm quantile fractions,
  * subtract-mod floor division), so the whole pipeline — histogram
  * counts AND quantile bounds — carries a full DuckDB oracle
  * (`q_x_histogram_quantile`), unlike estimator-based sketches that can
  * only gate in-band.
  *
  * Scale shape: build is one map-side-combined shuffle of (group,
  * bucket) — at most bins+2 distinct keys per group survive the partial
  * agg, so shuffle volume is group-cardinality-scale, not data-scale.
  * Merge shuffles store-sized inputs only. Quantile serving windows over
  * the store (≤ bins+2 rows per group). Nothing driver-side.
  *
  * Reference shape: the profiling/percentile requirement the reference
  * covers with per-run `approx_percentile` scans (`Meta_Guideline.md`
  * gold DQ profiling); this store answers the same questions
  * incrementally with exact error bars.
  */
object HistogramStore {

  /** Edge layout: regular buckets 0 .. nb-1 of width `w` starting at
    * `lo`; bucket -1 catches v < lo, bucket nb catches v > hi. `w` is
    * derived so nb <= bins always.
    */
  final case class Edges(lo: Long, hi: Long, bins: Int) {
    require(bins >= 1, "HistogramStore: bins must be >= 1")
    require(hi >= lo, "HistogramStore: hi must be >= lo")
    val span: Long = hi - lo + 1
    require(span > 0, // LONG overflow of hi-lo+1 (e.g. full-long range)
      "HistogramStore: [lo, hi] span must fit a positive long")
    val width: Long = (span + bins - 1) / bins
    val nb: Long = (span + width - 1) / width

    /** Exact floor-division bucket id. In-range v gives d = v - lo in
      * [0, span), so the subtract-mod long division is exact with no
      * sliver cases (cf. RangeJoin.bucketOf, which must also survive
      * Long.MinValue inputs — the clamp here fires first).
      */
    def bucket(v: Column): Column = {
      val d = v.cast("long") - lo
      when(v.isNull, lit(null).cast("long"))
        .when(v < lo, lit(-1L))
        .when(v > hi, lit(nb))
        .otherwise(call_function("div", d - pmod(d, lit(width)), lit(width)))
    }

    /** Closed integer bounds of a bucket; null on the open side of the
      * underflow/overflow buckets.
      */
    def loBound(bucket: Column): Column =
      when(bucket === -1L, lit(null).cast("long"))
        // overflow bucket holds v > hi, so its true lower bound is hi+1 —
        // lo + nb*width overshoots it whenever span is not an exact
        // multiple of width (mirrors hiBound's least(hi, ...) clamp)
        .when(bucket === nb, lit(hi) + 1L)
        .otherwise(lit(lo) + bucket * width)
    def hiBound(bucket: Column): Column =
      when(bucket === nb, lit(null).cast("long"))
        .otherwise(least(lit(hi), lit(lo) + (bucket + 1L) * width - 1L))
  }

  /** Sparse per-group histogram of `valueCol` (integral; NULLs are not
    * counted, matching what a percentile over the column would see).
    * Output: groupCols…, bucket, cnt.
    *
    * `weightCol` makes it a WEIGHTED histogram: `cnt` becomes total
    * integer weight and every downstream quantile is the quantile of the
    * EXPANDED multiset (each row repeated weight times) — e.g. value =
    * document length, weight = token count answers "what doc length
    * covers the p-th percentile of TOKENS". NULL- or zero-weight rows
    * contribute nothing; all-zero-weight groups serve no quantile rows
    * (n = 0 — both engines emit nothing, checked in the spec).
    */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
      edges: Edges, weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ edges.bucket(col(valueCol)).as("bucket"): _*)
      .agg(w.as("cnt"))
      // weighted builds can produce cnt=0 cells (all-zero-weight groups);
      // merge() filters them, so build() must too or the batch-split
      // bit-identity claim fails in the zero-sum corner
      .filter(col("cnt") =!= 0)
  }

  /** A signed delta: +weight per inserted row, -weight per deleted row. */
  def deltaOf(batch: DataFrame, groupCols: Seq[String], valueCol: String,
      edges: Edges, weight: Long, weightCol: Option[String] = None): DataFrame =
    build(batch, groupCols, valueCol, edges, weightCol)
      .withColumn("cnt", col("cnt") * weight)

  /** Fold any number of deltas into the store: one shuffle of store-sized
    * inputs. Zero-count buckets vanish; a delete delta that drives a
    * bucket negative raises (it deleted rows the store never held).
    */
  def merge(store: DataFrame, deltas: DataFrame*): DataFrame = {
    val keyed = deltas.foldLeft(store)(_ unionByName _)
      .groupBy(col("bucket") +: storeKeys(store).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    keyed
      .withColumn("cnt",
        when(col("cnt") < 0, raise_error(lit(
          "HistogramStore: delta drove a bucket count negative - deletes " +
            "must be rows of the maintained base")))
          .otherwise(col("cnt")))
      .filter(col("cnt") =!= 0)
      .select(storeKeys(store).map(col) :+ col("bucket") :+ col("cnt"): _*)
  }

  private def storeKeys(store: DataFrame): Seq[String] =
    store.columns.filterNot(Set("bucket", "cnt")).toSeq

  /** Exact bracketing bounds for lower-interpolation quantiles: for each
    * group and each q (in EXACT parts-per-million), the bucket containing
    * the zero-based rank `idx = floor((n-1) * q_ppm / 1e6)` — the element
    * `percentile_disc`-style lower quantile selects. The true quantile
    * value is certainly within [lo_bound, hi_bound].
    *
    * All arithmetic exact: idx via subtract-mod LONG division ((n-1) *
    * q_ppm needs n ≲ 9e12 rows per group before the ANSI multiplication
    * raises on overflow), bucket search via a running-sum window over
    * ≤ nb+2 rows per group.
    */
  def quantileBounds(store: DataFrame, groupCols: Seq[String],
      qsPpm: Seq[Long], edges: Edges): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 0L && q <= 1000000L),
      "HistogramStore: quantiles are ppm values in [0, 1000000]")
    val g = groupCols.map(col)
    val cumW = Window.partitionBy(g: _*).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prod = (col("n") - 1L) * col("q_ppm")
    store
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(g: _*)))
      .withColumn("q_ppm", explode(array(qsPpm.map(lit): _*)))
      .withColumn("idx",
        call_function("div", prod - pmod(prod, lit(1000000L)), lit(1000000L)))
      .filter(col("cum") > col("idx") && col("cum") - col("cnt") <= col("idx"))
      .select(g ++ Seq(col("q_ppm"), col("n"), col("idx"), col("bucket"),
        edges.loBound(col("bucket")).as("lo_bound"),
        edges.hiBound(col("bucket")).as("hi_bound")): _*)
  }
}
