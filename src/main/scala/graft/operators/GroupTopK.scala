package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K rows per group by an explicit ordering — "best 3 products per
  * brand" and every leaderboard-shaped gold query.
  *
  * Scale: the row_number-filter shape compiles to Spark's WindowGroupLimit:
  * each MAP task emits at most k rows per group BEFORE the shuffle, so the
  * exchange carries ≈ k × groups × partitions rows, not the full table.
  * A spec asserts WindowGroupLimit is present in the physical plan.
  *
  * The ordering must be total (add a unique tiebreak column) or the
  * selected rows are nondeterministic under ties.
  */
object GroupTopK {

  def topKPerGroup(
      df: DataFrame,
      group: Seq[String],
      ordering: Seq[Column],
      k: Int
  ): DataFrame = {
    require(k > 0, "topKPerGroup: k must be positive")
    val w = Window.partitionBy(group.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }
}
