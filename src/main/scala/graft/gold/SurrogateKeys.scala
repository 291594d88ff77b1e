package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment.
  *
  * The reference uses an UNPARTITIONED `row_number() OVER (ORDER BY ts, id)`
  * plus a max-existing-SK offset (Meta_Guideline.md:2624-2627, 2662-2665).
  * That is a single-partition shuffle — fine for a few million dimension
  * rows, catastrophic at 100 TB (SURVEY §7.4.2). Both modes are provided:
  *
  *  - `referenceMode`: bit-compatible with the reference (dense, ordered,
  *    starts at offset+1). Use for parity tests and small dims.
  *  - `scalableMode`: dense, deterministic, cluster-parallel. Sorts by the
  *    given ordering (range partitioner → globally ordered partitions), then
  *    zipWithIndex — two passes, no single-partition bottleneck. Same
  *    output as referenceMode for a total ordering.
  */
object SurrogateKeys {

  def referenceMode(
      df: DataFrame,
      ordering: Seq[Column],
      skCol: String = "sk",
      offset: Long = 0L
  ): DataFrame =
    df.withColumn(
      skCol,
      (row_number().over(Window.orderBy(ordering: _*)) + offset).cast("long")
    )

  def scalableMode(
      df: DataFrame,
      ordering: Seq[Column],
      skCol: String = "sk",
      offset: Long = 0L
  ): DataFrame = {
    val spark  = df.sparkSession
    val sorted = df.orderBy(ordering: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(skCol, org.apache.spark.sql.types.LongType, false)
    )
    // zipWithIndex: one extra job to count per-partition sizes, then a
    // narrow mapPartitions — no shuffle beyond the range sort itself.
    val withId = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1 + offset))
    }
    spark.createDataFrame(withId, schema)
  }

  /** Max existing SK, for incremental offsets (Meta_Guideline.md:2581). */
  def maxSk(dim: DataFrame, skCol: String): Long = {
    val r = dim.agg(coalesce(max(col(skCol)), lit(0L))).head()
    r.getLong(0)
  }
}
