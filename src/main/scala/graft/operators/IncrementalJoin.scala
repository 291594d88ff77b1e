package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized inner equi-join view
  * `V = A ⋈ B` under snapshot deltas on both sides — the join sibling of
  * [[IncrementalAgg]] (the reference rebuilds its gold join tables from
  * scratch each run; at 100 TB the nightly full re-join is the first thing
  * that stops fitting the window; reference Meta_Guideline.md:905-960
  * ingest/rebuild contract).
  *
  * Delta rule (inserts/updates/deletes folded into per-side kept/new
  * partitions): with `Aᵏ = A_old ∖ touched(ΔA)` (rows the delta didn't
  * touch) and `Aⁿ` the delta's after-images (inserts + update afters),
  *
  * {{{ V' = Aⁿ⋈Bⁿ ∪ Aⁿ⋈Bᵏ ∪ Aᵏ⋈Bⁿ ∪ Aᵏ⋈Bᵏ, and Aᵏ⋈Bᵏ = V ∖ touched }}}
  *
  * The four terms are disjoint by construction, so the result is exactly
  * the full re-join of the new snapshots — `q_o_incr_join`'s DuckDB oracle
  * checks precisely that identity.
  *
  * Plan shape at scale: the touched-key sets and after-images are
  * batch-sized, so every term involving a delta broadcasts it — the big
  * stored inputs (`view`, `aOld`, `bOld`) are scanned once each and NEVER
  * shuffled (broadcast anti joins for the kept partitions, broadcast hash
  * joins for the delta cross terms). Per-batch cost is O(|scan| + |Δ|·fanout),
  * with zero exchange on the 100 TB side.
  *
  * Column contract: A-side and B-side column names must be disjoint;
  * `view` carries both sides' columns (as produced by `join(aOld, bOld)`);
  * deltas are [[SnapshotDiff.diff]] outputs over the same columns.
  */
object IncrementalJoin {

  /** Null-safe broadcast anti join on `keys` (PK semantics: a NULL key is
    * one matchable value, mirroring SnapshotDiff).
    */
  private def antiTouched(base: DataFrame, touched: DataFrame, keys: Seq[String]): DataFrame = {
    val b = base.alias("__ij_b")
    val t = touched.alias("__ij_t")
    val eq = keys.map(k => col(s"__ij_b.$k") <=> col(s"__ij_t.$k")).reduce(_ && _)
    b.join(broadcast(t), eq, "left_anti")
  }

  /** @param view  stored join view (old `A ⋈ B` rows, both sides' columns)
    * @param aOld  old A snapshot (only the columns the view carries from A)
    * @param dA    `SnapshotDiff.diff(aOld, aNew, aKeys, ...)` output
    * @param aKeys A-side primary key (present in the view)
    * @param bOld / dB / bKeys  — same for the B side
    * @param on    inner equi-join condition as (A-col, B-col) name pairs
    * @return the maintained view — equal to the full inner join of the new
    *         snapshots
    */
  def mergeJoinView(
      view: DataFrame,
      aOld: DataFrame, dA: DataFrame, aKeys: Seq[String],
      bOld: DataFrame, dB: DataFrame, bKeys: Seq[String],
      on: Seq[(String, String)]
  ): DataFrame = {
    val aTouched = dA.select(aKeys.map(col): _*).distinct()
    val bTouched = dB.select(bKeys.map(col): _*).distinct()
    val aNew = dA.filter(col("change_type") =!= "delete").drop("change_type")
      .select(aOld.columns.map(col): _*)
    val bNew = dB.filter(col("change_type") =!= "delete").drop("change_type")
      .select(bOld.columns.map(col): _*)
    val aKept = antiTouched(aOld, aTouched, aKeys)
    val bKept = antiTouched(bOld, bTouched, bKeys)
    val vKept = antiTouched(antiTouched(view, aTouched, aKeys), bTouched, bKeys)

    // Delta cross terms: the delta side is batch-sized → broadcast it, so
    // the stored side joins without an exchange.
    def eq(l: DataFrame, r: DataFrame): Column =
      on.map { case (ac, bc) => l(ac) === r(bc) }.reduce(_ && _)
    val cols  = view.columns.map(col).toSeq
    val term1 = broadcast(aNew).join(bKept, eq(aNew, bKept)).select(cols: _*)
    val term2 = aKept.join(broadcast(bNew), eq(aKept, bNew)).select(cols: _*)
    val term3 = aNew.join(broadcast(bNew), eq(aNew, bNew)).select(cols: _*)

    vKept.select(cols: _*)
      .unionByName(term1).unionByName(term2).unionByName(term3)
  }
}
