package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Missing-data strategies — the reference applies ≥2 per Silver table
  * (Meta_Guideline.md:1624-1650, 1766-1790; requirements/...:69): impute
  * with a default + boolean flag column, or drop. Strategy metadata is
  * recorded in a `cleaning_strategies` array column (:1647-1650).
  */
object Impute {

  /** Replace nulls with `fallback` and record `<col>_imputed` boolean flag
    * (reference: `signup_ts_imputed`, `has_missing_dates`, ...).
    */
  def withFlag(df: DataFrame, c: String, fallback: Column): DataFrame =
    df.withColumn(s"${c}_imputed", col(c).isNull)
      .withColumn(c, coalesce(col(c), fallback))

  /** Plain default-on-null, no flag. */
  def defaultOnNull(df: DataFrame, c: String, fallback: Column): DataFrame =
    df.withColumn(c, coalesce(col(c), fallback))

  /** Drop rows where any of `cols` is null (strategy "drop"). */
  def dropIfNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("any", cols)

  /** Record which strategies were applied, as the reference's
    * `cleaning_strategies` ArrayType(StringType) metadata column.
    */
  def recordStrategies(df: DataFrame, strategies: Seq[String]): DataFrame =
    df.withColumn("cleaning_strategies", array(strategies.map(lit): _*))

  /** Parse "TRUE"/"FALSE" (case-insensitive) to boolean, else null —
    * reference boolean coercion (Meta_Guideline.md:1112-1115).
    */
  def parseBoolean(c: Column): Column =
    when(upper(c) === "TRUE", lit(true))
      .when(upper(c) === "FALSE", lit(false))
      .otherwise(lit(null).cast("boolean"))
}
