package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension. The reference generates it with a driver-side Python
  * loop (Meta_Guideline.md:2785-2843) — an anti-pattern; here it's a single
  * distributed expression: `explode(sequence(start, end))` + column
  * derivations, fully codegen'd, no driver materialization.
  *
  * Columns per reference dim_date schema (Meta_Guideline.md:2824-2843):
  * date_sk = YYYYMMDD int, calendar breakdowns, weekend flag.
  */
object DimDate {

  def build(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    val days = spark
      .sql(s"SELECT explode(sequence(date'$startDate', date'$endDate')) AS date")
    days
      .withColumn("date_sk", (year(col("date")) * 10000 +
        month(col("date")) * 100 + dayofmonth(col("date"))).cast("int"))
      .withColumn("year", year(col("date")))
      .withColumn("quarter", quarter(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("day_of_month", dayofmonth(col("date")))
      .withColumn("week_of_year", weekofyear(col("date")))
      // ISO day-of-week 1=Mon..7=Sun: portable across engines (Spark's
      // dayofweek() is 1=Sunday, DuckDB's dayofweek is 0=Sunday).
      .withColumn("day_of_week", dayofweek(col("date")))
      .withColumn("iso_dow", ((dayofweek(col("date")) + 5) % 7) + 1)
      .withColumn("is_weekend", col("iso_dow") >= 6)
      .select(
        "date_sk", "date", "year", "quarter", "month", "day_of_month",
        "week_of_year", "day_of_week", "iso_dow", "is_weekend"
      )
  }
}
