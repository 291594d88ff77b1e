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
  /** events.ts has shipped as BOTH Parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations — the loader normalizes
    * either to TIMESTAMP_NTZ by inspecting the read schema:
    *
    *  - NANOS (surfaces as Long under the nanosAsLong conf, (re)applied at
    *    read time for sessions NOT built by GraftSession): truncated to
    *    microseconds with integer division (ns values ~1.7e18 exceed double
    *    precision — `div`, not `/`) and rebuilt via `timestampadd` on an
    *    NTZ epoch literal — timezone-independent, unlike
    *    `timestamp_micros(...).cast(ntz)` which would shift by the session
    *    offset on a non-UTC session.
    *  - MICROS without timezone: already read as TIMESTAMP_NTZ
    *    (inferTimestampNTZ) — passed through; any other surfacing is cast.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case org.apache.spark.sql.types.TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
