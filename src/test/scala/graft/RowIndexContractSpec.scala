package graft

import org.apache.spark.sql.functions._

/** The parquet hidden-metadata contract deletion vectors are built on:
  * `_metadata.row_index` is the per-file physical row position — zero
  * based, dense per file, and STABLE under pushed filters (a filtered
  * scan reports the same (file, row_index) a full scan does). If a Spark
  * upgrade ever broke any of these, every DV read would silently
  * mis-target rows — this spec is the canary.
  */
class RowIndexContractSpec extends SparkSpecBase {
  import spark.implicits._

  test("_metadata.row_index is per-file, stable, and filter-independent") {
    val dir = java.nio.file.Files.createTempDirectory("rowidx").toString
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "p")
      .repartitionByRange(2, col("id")).write.mode("overwrite").parquet(dir)
    val withIdx = spark.read.parquet(dir)
      .select(col("id"), col("_metadata.file_name").as("f"),
        col("_metadata.row_index").as("ri"))
    val n = withIdx.groupBy("f").agg(count(lit(1)).as("c"),
      min("ri").as("mn"), max("ri").as("mx")).collect()
    n.length shouldBe 2
    n.foreach { r =>
      r.getAs[Long]("mn") shouldBe 0L
      r.getAs[Long]("mx") shouldBe r.getAs[Long]("c") - 1L
    }
    // stability under a pushed filter: the surviving rows keep the SAME
    // (file, row_index) they had on the full scan
    val full = withIdx.filter(col("id") % 7 === 0)
      .select("id", "f", "ri").collect().map(_.toSeq).toSet
    val filtered = spark.read.parquet(dir).filter(col("id") % 7 === 0)
      .select(col("id"), col("_metadata.file_name"),
        col("_metadata.row_index")).collect().map(_.toSeq).toSet
    filtered shouldBe full
  }
}
