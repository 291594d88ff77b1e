package graft.gold

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold → warehouse JDBC publish — the reference's Redshift publish leg
  * (`Meta_Guideline.md:4330-4354`: gold tables are COPY'd into Redshift
  * Serverless for BI serving) re-expressed over Spark's JDBC sink. The
  * stand-in warehouse here is DuckDB over JDBC (the only warehouse this
  * offline environment ships); against a real Redshift/Postgres the SAME
  * code runs with a different URL — nothing below is DuckDB-specific
  * beyond the default driver class resolution.
  *
  * Idempotency contract (the part the reference gets from
  * `TRUNCATE`+`COPY` per run): [[publishIdempotent]] scopes a DELETE to
  * exactly the run-key values present in the outgoing batch, then appends.
  * Re-publishing the same run therefore converges to the same table state
  * (at-least-once execution, exactly-once effect — the same idempotency
  * class as `streaming.EventStream.scd2UpsertStream`). A crash between
  * DELETE and append is repaired by the re-run; runs for OTHER run-key
  * values are never touched, so daily publishes compose incrementally.
  *
  * Scale shape: the write is `numConnections` parallel JDBC batch-insert
  * streams (Spark coalesces to that many partitions — against Redshift
  * you'd size this to the WLM slot count; the DELETE is one statement
  * pushed to the warehouse, O(run partition) there). The read-back is a
  * single-partition JDBC scan by default — serving-side verification,
  * not a data-movement path.
  */
object JdbcPublish {

  /** Minimal DuckDB dialect: Spark 4's write path probes table existence
    * with `SELECT 1 FROM t WHERE 1=0` and RETHROWS the probe's exception
    * unless the dialect classifies it as object-not-found (the default
    * dialect only recognizes standard SQLSTATEs, which DuckDB's JDBC
    * driver does not set) — without this, the first-ever publish dies on
    * the existence probe instead of creating the table.
    */
  private object DuckDbDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")
    override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
      e.getMessage != null && e.getMessage.contains("does not exist")
    // DuckDB's JDBC metadata reports integer columns as UNSIGNED, which
    // the default mapping inflates to DECIMAL(20,0)/DECIMAL(10,0) — but
    // DuckDB's BIGINT/INTEGER are signed 64/32-bit; map them back so the
    // round-trip is type-lossless
    override def getCatalystType(sqlType: Int, typeName: String, size: Int,
        md: org.apache.spark.sql.types.MetadataBuilder)
        : Option[org.apache.spark.sql.types.DataType] = sqlType match {
      case java.sql.Types.BIGINT =>
        Some(org.apache.spark.sql.types.LongType)
      case java.sql.Types.INTEGER =>
        Some(org.apache.spark.sql.types.IntegerType)
      case _ => None
    }
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbDialect)

  /** Append `df` into `table` at `url` after deleting any existing rows
    * whose `runCol` value appears in `df` — delete-then-insert keyed by
    * the run partition. Creates the table on first publish (Spark's JDBC
    * Append semantics). `runCol` values are collected — they are run
    * dates / batch ids, k-bounded by construction.
    */
  def publishIdempotent(
      df: DataFrame,
      url: String,
      table: String,
      runCol: String,
      numConnections: Int = 4
  ): Unit = {
    val runValues = df.select(col(runCol)).distinct().collect().map(_.get(0))
    val conn = DriverManager.getConnection(url)
    try {
      val exists = {
        val rs = conn.getMetaData.getTables(null, null, table, null)
        try rs.next() finally rs.close()
      }
      if (exists && runValues.nonEmpty) {
        val ph = runValues.map(_ => "?").mkString(", ")
        val st = conn.prepareStatement(
          s"""DELETE FROM "$table" WHERE "$runCol" IN ($ph)""")
        try {
          runValues.zipWithIndex.foreach { case (v, i) =>
            st.setObject(i + 1, v)
          }
          st.executeUpdate()
        } finally st.close()
      }
    } finally conn.close()
    df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", s""""$table"""")
      .option("numPartitions", numConnections.toString)
      .option("batchsize", "10000")
      .mode("append")
      .save()
  }

  /** Read a published table back through the same JDBC surface — the
    * serving-side verification read ("did the warehouse receive exactly
    * what gold holds").
    */
  def readBack(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", s""""$table"""")
      .load()
}
