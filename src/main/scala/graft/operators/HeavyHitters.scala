package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters over an arbitrarily large key space, in two bounded
  * passes — the frequent-items primitive of a training-data pipeline
  * (dominant domains / templates / near-constant columns), where a full
  * `GROUP BY` over a 100 TB key column is exactly the shuffle you cannot
  * afford.
  *
  * Pass 1 runs the Karp–Shenker–Papadimitriou frequent-items sketch
  * (Spark's built-in `DataFrameStatFunctions.freqItems` — a mergeable
  * Misra–Gries-family counter map, partial per partition, merged at the
  * driver) with support `1/k`. The sketch's one-sided guarantee is the
  * whole design: any value with true count `> n/k` is PROVABLY in the
  * candidate set; the set may also carry false positives, and its size is
  * bounded by `k`, independent of data size. Pass 2 exact-counts ONLY the
  * candidates (the `isin` filter pushes into the scan; the aggregation is
  * map-side combined and carries at most `candidates × partitions` rows
  * into the exchange) and keeps `count * k > n`. False positives die in
  * pass 2, so the output is exact and deterministic — independent of
  * partitioning, input order, and whatever extra candidates the sketch
  * happened to keep. This is why the operator is oracle-checkable against
  * a plain exact `GROUP BY ... HAVING` at test scale.
  *
  * Reference analogue: the DQ distribution/top-N monitoring queries
  * (`meta_module_08` Athena checks) run exact `GROUP BY ... ORDER BY count`
  * over curated-zone columns; this is the same question asked at a scale
  * where the exact group-by is no longer the right first pass.
  */
object HeavyHitters {

  /** Values of `keyCol` occurring MORE THAN `n/k` times (strict), with
    * exact counts. Output columns: `keyCol`, `cnt`, `n_total`.
    *
    * `k` bounds both the candidate-set size and the driver collect
    * (`<= k` values); choose `k` = 1/min-interesting-frequency.
    */
  def exactHeavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    // Spark's freqItems requires support in [1e-4, 1], so 1/k floors k at
    // 10000 — beyond that the sketch pass itself would throw at runtime.
    require(k >= 2 && k <= 10000,
      s"exactHeavyHitters: k must be in [2, 10000] (freqItems support " +
        s"floor is 1e-4), got $k")
    val keyed = df.select(col(keyCol))
    val total = keyed.count()
    val candidates = keyed.stat.freqItems(Seq(keyCol), 1.0 / k)
      .head.getSeq[Any](0)
    if (candidates.isEmpty) {
      // uniform beyond the sketch's resolution: provably no heavy hitters
      keyed.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
        .withColumn("n_total", lit(total)).limit(0)
    } else {
      keyed
        .filter(col(keyCol).isin(candidates: _*))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(k.toLong) > lit(total))
        .withColumn("n_total", lit(total))
    }
  }

  /** Per-group variant: heavy hitters of `keyCol` WITHIN each value of
    * `groupCol` — "dominant template per source" — using one global
    * candidate pass (a value heavy in any group with group share `> 1/k`
    * of that group and group size `>= n/k` is heavy globally at support
    * `1/k²` — which caps `k` at 100, since freqItems floors support at
    * 1e-4; for finer groups run [[exactHeavyHitters]] per group subset
    * instead). Exactness within the candidate
    * set is preserved by the same recount argument; values outside the
    * candidate set are NOT guaranteed per-group — this is the documented
    * approximation boundary, so the gated query uses the global form.
    */
  def heavyHittersPerGroup(
      df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    // support here is 1/k², and freqItems floors support at 1e-4 → k <= 100
    // (k = 101 would throw IllegalArgumentException inside Spark).
    require(k >= 2 && k <= 100,
      s"heavyHittersPerGroup: k must be in [2, 100] (support is 1/k^2 and " +
        s"the freqItems floor is 1e-4), got $k")
    val keyed = df.select(col(groupCol), col(keyCol))
    val candidates = keyed.stat.freqItems(Seq(keyCol), 1.0 / (k.toLong * k))
      .head.getSeq[Any](0)
    val totals = keyed.groupBy(col(groupCol)).agg(count(lit(1)).as("n_group"))
    keyed
      .filter(col(keyCol).isin(candidates: _*))
      .groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .join(totals, groupCol)
      .filter(col("cnt") * lit(k.toLong) > col("n_group"))
  }
}
