package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaped Silver/Gold operators.
  *
  * Reference joins (SURVEY §2.3): left-outer enrichment with defaults for
  * non-matches (J1, Meta_Guideline.md:1799-1819), inner filtering join (J2,
  * :1948-1955), fact→dim surrogate-key lookup with SK=0 fallback (J3,
  * :2957-2967), left-anti FK integrity (J4, :3016-3019).
  *
  * Scale posture: dimension sides are small relative to facts — we pass them
  * through `broadcast()` so the fact side never shuffles. At 100 TB the fact
  * scan stays pipeline-local (no Exchange) for every dim lookup; only
  * genuinely large-large joins fall back to shuffled hash/sort-merge, which
  * Catalyst+AQE pick automatically when the hint is absent.
  */
object Enrich {

  /** Left-outer enrichment with defaults on non-match:
    * `datasets ← users(owner)`; unmatched → "Unknown"/"XX"
    * (Meta_Guideline.md:1805-1819). `defaults` maps enriched-column name →
    * literal fallback.
    */
  def leftWithDefaults(
      fact: DataFrame,
      dim: DataFrame,
      joinExpr: Column,
      defaults: Map[String, Any],
      broadcastDim: Boolean = true
  ): DataFrame = {
    val d      = if (broadcastDim) broadcast(dim) else dim
    val joined = fact.join(d, joinExpr, "left")
    defaults.foldLeft(joined) { case (df, (c, v)) =>
      df.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** Keep fact rows whose key exists in `dim` — the reference does an inner
    * join then manually drops the duplicated key column
    * (Meta_Guideline.md:1948-1955); `left_semi` is the idiomatic equivalent:
    * no right-side columns, no duplicate-key row explosion, and the right
    * side is broadcast when small.
    */
  def filterExisting(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim.select(keys.map(col): _*).distinct()), keys, "left_semi")

  /** Inverse: rows whose key does NOT exist (left_anti). */
  def filterMissing(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim.select(keys.map(col): _*).distinct()), keys, "left_anti")

  /** Fact→dim surrogate-key lookup: left join on the natural key, misses get
    * `skDefault` (reference: SK=0 "Unknown" member, Meta_Guideline.md:
    * 2957-2967; requirements/...:111). The dim is broadcast: at scale this
    * is a map-side hash lookup, zero fact shuffle.
    */
  def lookupSk(
      fact: DataFrame,
      dim: DataFrame,
      nk: String,
      skCol: String,
      skDefault: Long = 0L
  ): DataFrame =
    fact
      .join(broadcast(dim.select(col(nk), col(skCol))), Seq(nk), "left")
      .na
      .fill(skDefault, Seq(skCol))
}
