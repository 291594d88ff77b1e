package graft.sqlfront

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** SQL entry point — the reference's third query surface (Athena/Presto DQ
  * and monitoring statements, Meta_Guideline.md:2347-2480, 4181-4328) runs
  * here through `spark.sql` over registered views: one engine, one planner,
  * no second system.
  *
  * At scale the views would be catalog tables (Hive/Unity/Glue-compatible
  * via Spark catalogs); temp views keep the harness hermetic.
  */
object SqlFront {

  def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings
    ).foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }

  /** Duplicate-NK monitoring (reference dup-count checks): keys with more
    * than one row.
    */
  def duplicateKeys(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT user_id, COUNT(*) AS n_rows
        |FROM events GROUP BY user_id HAVING COUNT(*) > 1""".stripMargin)
  }

  /** Category distribution with percent-of-total (reference :2362-2371). */
  def distribution(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """WITH c AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |           GROUP BY o_orderpriority)
        |SELECT o_orderpriority, cnt,
        |  ROUND(cnt * 100e0 / SUM(cnt) OVER (), 2) AS pct
        |FROM c ORDER BY o_orderpriority""".stripMargin)
      // 100e0, not 100.0: a decimal literal would type the quotient as
      // DECIMAL in Spark SQL (scale-6 HALF_UP) while the oracle computes
      // in DOUBLE — double-rounding divergence at .xx5 boundaries.
  }

  /** Multi-table freshness (reference UNION ALL freshness checks
    * :4204-4218): latest data date per table.
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT 'orders' AS table_name, CAST(MAX(o_orderdate) AS DATE) AS latest FROM orders
        |UNION ALL
        |SELECT 'lineitem', CAST(MAX(l_shipdate) AS DATE) FROM lineitem
        |UNION ALL
        |SELECT 'events', CAST(MAX(ts) AS DATE) FROM events""".stripMargin)
  }
}
