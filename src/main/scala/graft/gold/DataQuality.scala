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
