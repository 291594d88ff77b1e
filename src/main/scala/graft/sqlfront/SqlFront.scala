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

  /** PERSISTENT catalog registration — the Glue-crawler equivalent
    * (reference crawls layer outputs into a queryable catalog,
    * Meta_Guideline.md:1538-1545): every testdata table becomes an
    * EXTERNAL parquet table (`CREATE TABLE … USING parquet LOCATION`) in
    * database `graft`, except `events`, whose nanos-parquet ts needs the
    * same normalization branch `core.Tables.events` applies — inlined into
    * a catalog VIEW over the parquet path (catalog views cannot reference
    * temp views; the `meta_bronze` lesson).
    *
    * Returns a CHILD session with `graft` as the current database, so the
    * monitoring SQL's unqualified `FROM orders` resolves through the
    * CATALOG — the q_sql gate family runs against catalog tables, not temp
    * views. The child also scopes `nanosAsLong` (events view) away from
    * the caller's session. Tables are dropped + re-created per call:
    * metadata-only, and the location must track the caller's `dir`.
    */
  def registerCatalog(spark: SparkSession, dir: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the tables live in the context-wide SHARED catalog: registration is
    // once per (SparkContext, dir), not per calling query — repeated
    // monitoring calls must not churn 10 DDL round-trips + an events
    // footer read each (the cache key includes the context so a fresh
    // test context re-registers)
    // keyed by the CURRENT dir, not a seen-set: alternating dirs must
    // re-register (the catalog holds exactly one dir's tables at a time).
    // compute() both serializes concurrent first callers on the key and
    // records the dir ONLY after the DDL block completes — a throw inside
    // the remapping function leaves the previous mapping in place, so the
    // next caller retries registration instead of querying a half-built
    // catalog
    val ctx = System.identityHashCode(spark.sparkContext)
    registeredDirs.compute(ctx, (_, prev) => {
      if (prev != dir) registerCatalogTables(s, dir)
      dir
    })
    s.catalog.setCurrentDatabase("graft")
    s
  }

  /** Drop the registration cache for this context and re-run the DDL —
    * the Glue-crawler re-crawl equivalent: a layer output whose SCHEMA
    * evolved after registration (new columns via mergeSchema, the
    * q_s14_schema_evolution shape) serves stale columns until the external
    * table is re-created, because `CREATE TABLE ... USING parquet
    * LOCATION` pins the schema inferred at creation time. Call after any
    * publish that may have widened a registered table.
    */
  def refreshCatalog(spark: SparkSession, dir: String): SparkSession = {
    registeredDirs.remove(System.identityHashCode(spark.sparkContext))
    registerCatalog(spark, dir)
  }

  private def registerCatalogTables(s: SparkSession, dir: String): Unit = {
    s.sql("CREATE DATABASE IF NOT EXISTS graft")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS graft.`$t`")
      s.sql(s"CREATE TABLE graft.`$t` USING parquet LOCATION '$dir/$t.parquet'")
    }
    val evPath = s"$dir/events.parquet"
    val evSchema = s.read.parquet(evPath).schema
    val tsExpr = evSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
      case org.apache.spark.sql.types.TimestampNTZType => "ts"
      case _ => "CAST(ts AS TIMESTAMP_NTZ)"
    }
    val evSelect = evSchema.fieldNames
      .map(c => if (c == "ts") s"$tsExpr AS ts" else s"`$c`").mkString(", ")
    s.sql(s"""CREATE OR REPLACE VIEW graft.events AS
             |SELECT $evSelect FROM parquet.`$evPath`""".stripMargin)
  }

  private val registeredDirs =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  /** Duplicate-NK monitoring (reference dup-count checks): keys with more
    * than one row.
    */
  def duplicateKeys(spark: SparkSession, dir: String): DataFrame = {
    val s = registerCatalog(spark, dir)
    s.sql(
      """SELECT user_id, COUNT(*) AS n_rows
        |FROM events GROUP BY user_id HAVING COUNT(*) > 1""".stripMargin)
  }

  /** Category distribution with percent-of-total (reference :2362-2371). */
  def distribution(spark: SparkSession, dir: String): DataFrame = {
    val s = registerCatalog(spark, dir)
    s.sql(
      """WITH c AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |           GROUP BY o_orderpriority)
        |SELECT o_orderpriority, cnt,
        |  ROUND(cnt * 100e0 / SUM(cnt) OVER (), 2) AS pct
        |FROM c ORDER BY o_orderpriority""".stripMargin)
      // 100e0, not 100.0: a decimal literal would type the quotient as
      // DECIMAL in Spark SQL (scale-6 HALF_UP) while the oracle computes
      // in DOUBLE — double-rounding divergence at .xx5 boundaries.
  }

  /** Register the reference's `meta_bronze` CATALOG views so its
    * schema-qualified monitoring SQL (`FROM meta_bronze.datasets`,
    * `FROM meta_bronze.users` — Meta_Guideline.md:4233-4305) executes
    * VERBATIM through `spark.sql`. Catalog views cannot reference temp
    * views, so the ts normalization (nanos parquet → TIMESTAMP_NTZ, the
    * same branch `core.Tables.events` takes) is inlined into the view
    * text against the parquet path; `run_date` is the reference's daily
    * partition column, derived from the event timestamp.
    *
    * Registers the views and returns the CHILD session they must be queried
    * through: `nanosAsLong` is set on a `spark.newSession()` clone so the
    * legacy-parquet conf never leaks into the caller's shared session (the
    * same conf-scoping fix the round-4 verdict demanded for
    * qRangeJoinAuto). The views land in the SHARED catalog (SharedState is
    * common to all sessions of one SparkContext), but only the returned
    * session is guaranteed to read the nanos-parquet branch of the view
    * text correctly.
    */
  def registerMetaBronze(spark: SparkSession, dir: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registerMetaBronzeIn(s, dir)
    s
  }

  private def registerMetaBronzeIn(spark: SparkSession, dir: String): Unit = {
    val path = s"$dir/events.parquet"
    val tsExpr = spark.read.parquet(path).schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
      case org.apache.spark.sql.types.TimestampNTZType => "ts"
      case _ => "CAST(ts AS TIMESTAMP_NTZ)"
    }
    spark.sql("CREATE DATABASE IF NOT EXISTS meta_bronze")
    spark.sql(
      s"""CREATE OR REPLACE VIEW meta_bronze.datasets AS
         |SELECT event_id, $tsExpr AS ts, user_id, event_type,
         |  CAST($tsExpr AS DATE) AS run_date
         |FROM parquet.`$path`""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE VIEW meta_bronze.users AS
         |SELECT user_id, CAST($tsExpr AS DATE) AS run_date
         |FROM parquet.`$path`""".stripMargin)
  }

  /** Reference anomaly check 1 VERBATIM (record-count z-score,
    * Meta_Guideline.md:4233-4258): daily counts over a trailing window,
    * mean/stddev of the PRIOR days, z-score of the run date. Only the
    * `{run_date}` parameter is substituted — exactly what the reference's
    * f-string does. The caller wraps a ROUND for cross-engine
    * double-stability of the derived stats; the inner text is untouched.
    */
  def recordCountAnomalySql(runDate: String): String =
    s"""
       |        WITH daily_counts AS (
       |            SELECT
       |                run_date,
       |                COUNT(*) as record_count
       |            FROM meta_bronze.datasets
       |            WHERE run_date >= DATE_ADD('$runDate', -7)
       |              AND run_date <= '$runDate'
       |            GROUP BY run_date
       |        ),
       |        stats AS (
       |            SELECT
       |                AVG(record_count) as avg_count,
       |                STDDEV(record_count) as std_count
       |            FROM daily_counts
       |            WHERE run_date < '$runDate'
       |        )
       |        SELECT
       |            d.run_date,
       |            d.record_count,
       |            s.avg_count,
       |            s.std_count,
       |            ABS(d.record_count - s.avg_count) / s.std_count as z_score
       |        FROM daily_counts d
       |        CROSS JOIN stats s
       |        WHERE d.run_date = '$runDate'
       |        """.stripMargin

  def recordCountAnomaly(spark: SparkSession, dir: String,
      runDate: String): DataFrame = {
    val s = registerMetaBronze(spark, dir)
    s.sql(s"""SELECT run_date, record_count,
      round(avg_count, 6) AS avg_count, round(std_count, 6) AS std_count,
      round(z_score, 6) AS z_score
      FROM (${recordCountAnomalySql(runDate)})""")
  }

  /** Reference anomaly check 2 VERBATIM (duplicate-rate spike,
    * Meta_Guideline.md:4282-4305). Note the reference's own semantics:
    * the outer WHERE filters to the run date BEFORE the window function
    * evaluates (standard SQL ordering), so the trailing-average window
    * sees a single row and its 6-PRECEDING..1-PRECEDING frame is empty —
    * `avg_dup_rate` is NULL by the reference's construction, and the
    * engine reproduces that faithfully (as Athena/Presto would).
    */
  def duplicateRateSpikeSql(runDate: String): String =
    s"""
       |        WITH dedup_stats AS (
       |            SELECT
       |                run_date,
       |                COUNT(*) as total_records,
       |                COUNT(DISTINCT user_id) as unique_users,
       |                (COUNT(*) - COUNT(DISTINCT user_id)) * 100.0 / COUNT(*) as duplicate_rate
       |            FROM meta_bronze.users
       |            WHERE run_date >= DATE_ADD('$runDate', -7)
       |              AND run_date <= '$runDate'
       |            GROUP BY run_date
       |        )
       |        SELECT
       |            run_date,
       |            duplicate_rate,
       |            AVG(duplicate_rate) OVER (
       |                ORDER BY run_date
       |                ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING
       |            ) as avg_dup_rate
       |        FROM dedup_stats
       |        WHERE run_date = '$runDate'
       |        """.stripMargin

  def duplicateRateSpike(spark: SparkSession, dir: String,
      runDate: String): DataFrame = {
    val s = registerMetaBronze(spark, dir)
    // Spark types 100.0 as DECIMAL, DuckDB computes the same exact
    // rational its own way — normalize both to a 6dp DOUBLE for the
    // hash compare; the inner text stays verbatim
    s.sql(s"""SELECT run_date,
      CAST(round(duplicate_rate, 6) AS DOUBLE) AS duplicate_rate,
      CAST(round(avg_dup_rate, 6) AS DOUBLE) AS avg_dup_rate
      FROM (${duplicateRateSpikeSql(runDate)})""")
  }

  /** Multi-table freshness (reference UNION ALL freshness checks
    * :4204-4218): latest data date per table.
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val s = registerCatalog(spark, dir)
    s.sql(
      """SELECT 'orders' AS table_name, CAST(MAX(o_orderdate) AS DATE) AS latest FROM orders
        |UNION ALL
        |SELECT 'lineitem', CAST(MAX(l_shipdate) AS DATE) FROM lineitem
        |UNION ALL
        |SELECT 'events', CAST(MAX(ts) AS DATE) FROM events""".stripMargin)
  }
}
