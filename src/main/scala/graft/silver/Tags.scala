package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Tag-table Silver transforms (reference: Meta_Guideline.md:1248-1305,
  * 1948-2001): JSON-array parse → explode → normalize → dedup → filtering
  * join → frequency classification.
  */
object Tags {

  /** `Tags` column is a JSON array string (`["tag1","tag2"]`) — parse and
    * explode to one row per (dataset_id, tag).
    */
  def explodeTags(df: DataFrame, jsonCol: String = "Tags"): DataFrame =
    df.withColumn("tag", explode(from_json(col(jsonCol), ArrayType(StringType))))
      .drop(jsonCol)

  /** lower + trim + strip to [a-z0-9-] (Meta_Guideline.md:1963-1967). */
  def normalize(tag: Column): Column =
    regexp_replace(trim(lower(tag)), "[^a-z0-9\\-]", "")

  def normalized(df: DataFrame): DataFrame =
    df.withColumn("tag_normalized", normalize(col("tag")))
      .filter(col("tag_normalized") =!= "")

  /** Popularity classification by share of total usage
    * (Meta_Guideline.md:1982-1994): >10% popular, >1% common, >10 uses
    * regular, else rare. Integer math (cnt*100 vs total) — no FP ratios.
    */
  def classify(tagUsage: DataFrame, cntCol: String = "usage_count"): DataFrame = {
    val total = sum(col(cntCol)).over(org.apache.spark.sql.expressions.Window.partitionBy())
    tagUsage.withColumn(
      "tag_category",
      when(col(cntCol) * 100 > total * 10, "popular")
        .when(col(cntCol) * 100 > total, "common")
        .when(col(cntCol) > 10, "regular")
        .otherwise("rare")
    )
  }
}
