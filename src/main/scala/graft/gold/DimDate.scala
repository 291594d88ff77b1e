package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension. The reference generates it with a driver-side Python
  * loop (Meta_Guideline.md:2785-2843) — an anti-pattern; here it's a single
  * distributed expression: `explode(sequence(start, end))` + column
  * derivations, fully codegen'd, no driver materialization.
  *
  * Columns per reference dim_date schema (Meta_Guideline.md:2798-2843):
  * date_sk = YYYYMMDD int, calendar breakdowns, weekend flag, holiday flag
  * (the reference's four fixed-date Vietnam holidays, :2790-2796), fiscal
  * calendar starting July (:2816-2818), days_in_month leap-aware when-chain
  * (:2852-2857).
  */
object DimDate {

  /** (month, day) pairs the reference flags as holidays: New Year Jan 1,
    * Reunification Apr 30, Labour May 1, National Day Sep 2.
    */
  val HolidayMonthDays: Seq[(Int, Int)] = Seq((1, 1), (4, 30), (5, 1), (9, 2))

  def build(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    val days = spark
      .sql(s"SELECT explode(sequence(date'$startDate', date'$endDate')) AS date")
    val m = col("month")
    days
      .withColumn("date_sk", (year(col("date")) * 10000 +
        month(col("date")) * 100 + dayofmonth(col("date"))).cast("int"))
      .withColumn("year", year(col("date")))
      .withColumn("quarter", quarter(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("day_of_month", dayofmonth(col("date")))
      .withColumn("day_of_year", dayofyear(col("date")))
      .withColumn("week_of_year", weekofyear(col("date")))
      // ISO day-of-week 1=Mon..7=Sun: portable across engines (Spark's
      // dayofweek() is 1=Sunday, DuckDB's dayofweek is 0=Sunday).
      .withColumn("day_of_week", dayofweek(col("date")))
      .withColumn("iso_dow", ((dayofweek(col("date")) + 5) % 7) + 1)
      .withColumn("is_weekend", col("iso_dow") >= 6)
      .withColumn("is_weekday", !col("is_weekend"))
      .withColumn("year_month", format_string("%d%02d", col("year"), m))
      .withColumn("is_holiday",
        HolidayMonthDays
          .map { case (hm, hd) => m === hm && col("day_of_month") === hd }
          .reduce(_ || _))
      // fiscal year starts July: FY(y) covers Jul y .. Jun y+1
      .withColumn("fiscal_year",
        when(m >= 7, col("year")).otherwise(col("year") - 1))
      .withColumn("fiscal_quarter", (((m + 5) % 12) / 3).cast("int") + 1)
      .withColumn("days_in_month",
        when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
          .when(m.isin(4, 6, 9, 11), 30)
          .when(m === 2 && col("year") % 4 === 0 &&
            (col("year") % 100 =!= 0 || col("year") % 400 === 0), 29)
          .otherwise(28))
      .select(
        "date_sk", "date", "year", "quarter", "month", "day_of_month",
        "day_of_year", "week_of_year", "day_of_week", "iso_dow",
        "is_weekend", "is_weekday", "year_month", "is_holiday",
        "fiscal_year", "fiscal_quarter", "days_in_month"
      )
  }
}
