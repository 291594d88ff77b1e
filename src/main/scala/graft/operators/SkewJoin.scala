package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins — the manual fallback when AQE's
  * skew-join splitting isn't enough (e.g. one customer key carrying 1% of a
  * 100 TB fact table).
  *
  * Mechanics: the fact side gets a DETERMINISTIC pseudo-random salt in
  * [0, n) derived from a hash of stable row columns (never `rand()` — a
  * stage retry would re-roll and duplicate/lose rows); the dim side is
  * replicated n× with an exploded salt column; the join key becomes
  * (key, salt). One skewed key now spreads over n reducers. Results are
  * identical to the unsalted join — only the partitioning changes.
  */
object SkewJoin {

  /** Inner/left salted equi-join of `fact` to a (small-ish) `dim` on
    * `key`.
    *
    * @param saltFrom stable fact columns to derive the salt from
    * @param n        salt fan-out (number of reducers a hot key spreads over)
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: Seq[String],
      n: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(n > 0)
    // Right/full outer would emit every unmatched (replicated) dim row n
    // times — only fact-preserving join types are equivalent to the
    // unsalted join.
    val ok = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched dim rows")
    val salted = fact.withColumn(
      "__salt", pmod(hash(saltFrom.map(col): _*), lit(n)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
