package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive aggregate tables: fold a new batch's
  * partial aggregates into a stored per-group aggregate without touching
  * the historical raw data — the gold-layer pattern that turns an O(full
  * history) nightly recompute into an O(batch + |groups|) merge (the
  * reference rebuilds fact_*_daily from scratch each run; incremental
  * maintenance is its 100 TB replacement).
  *
  * Only ADDITIVE measures participate (counts, sums, min/max with their own
  * combine): `merged = stored ⊕ agg(batch)`, a full-outer join on the group
  * keys where each measure combines via its monoid. Ratios and averages are
  * derived afterwards from the maintained sums — never stored, or they stop
  * being mergeable.
  *
  * Plan shape: aggregating the batch is a map-side-combined shuffle on the
  * batch only; the merge join shuffles |groups| rows, not |history| rows.
  * The invariant `mergeAdditive(agg(A), agg(B)) == agg(A ∪ B)` is what the
  * DuckDB oracle checks.
  */
object IncrementalAgg {

  /** Merge two aggregate tables that share `keys` and additive measure
    * columns. `sums` combine with `+`, `mins` with `least`, `maxs` with
    * `greatest`; a group missing from one side keeps the other side's
    * values.
    */
  def mergeAdditive(
      stored: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil
  ): DataFrame = {
    val s = stored.alias("__ia_s")
    val d = delta.alias("__ia_d")
    // null-SAFE key equality: a NULL-keyed group (e.g. the "unknown" member)
    // is a real group and must merge, not split into two output rows
    val keyEq = keys.map(k => col(s"__ia_s.$k") <=> col(s"__ia_d.$k")).reduce(_ && _)
    def both(c: String) = (col(s"__ia_s.$c"), col(s"__ia_d.$c"))
    s.join(d, keyEq, "full_outer").select(
      keys.map(k => coalesce(col(s"__ia_d.$k"), col(s"__ia_s.$k")).as(k)) ++
        // SQL SUM semantics: NULL only when BOTH sides are NULL (a stored
        // all-NULL-measure group must stay NULL, not become 0 — "no data"
        // and "zero total" are different facts)
        sums.map { c => val (a, b) = both(c)
          when(a.isNull && b.isNull, lit(null))
            .otherwise(coalesce(a, lit(0)) + coalesce(b, lit(0))).as(c) } ++
        mins.map { c => val (a, b) = both(c)
          coalesce(least(a, b), a, b).as(c) } ++
        maxs.map { c => val (a, b) = both(c)
          coalesce(greatest(a, b), a, b).as(c) }: _*)
  }
}
