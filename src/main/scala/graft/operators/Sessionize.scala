package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group per-key event streams
  * into sessions separated by inactivity gaps.
  *
  * Two formulations exist in this library: Structured Streaming uses the
  * built-in `session_window` (streaming.EventStream); the batch version
  * here uses lag + cumulative-sum — one shuffle on the key, two window
  * passes sharing the same Exchange, and (unlike session_window's
  * end = last+gap convention) session bounds that are exact min/max event
  * times, which is what batch analytics usually wants.
  */
object Sessionize {

  /** @param gapInterval SQL interval literal body, e.g. "30 MINUTE" */
  def gapSessions(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapInterval: String
  ): DataFrame = {
    val w    = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull || (col(tsCol) - prev > expr(s"INTERVAL $gapInterval")), 1L
    ).otherwise(0L)
    df.withColumn("__new_s", newSession)
      .withColumn("session_id",
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }
}
