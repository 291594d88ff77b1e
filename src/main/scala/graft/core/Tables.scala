package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's deterministic testdata directory
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * All reads go through `spark.read.parquet` so Catalyst gets column pruning
  * and filter pushdown for free — callers should project/filter as early as
  * possible and let the optimizer push it into the scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is Parquet TIMESTAMP(NANOS) → read as Long (see
    * GraftSession) and truncated to microseconds with integer division
    * (ns values ~1.7e18 exceed double precision — `div`, not `/`).
    */
  def events: DataFrame =
    t("events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
