package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._

/** BATCH access to TxLog tables through the registered `graft-txlog`
  * format (round-12 verdict item 1): `spark.read.format(...)` ≡
  * `TxLog.read` — DV-aware, log schema authoritative, versionAsOf /
  * timestampAsOf options — and SQL over catalog-registered TxLog tables.
  * Plan contracts: a vector-less read is the NATIVE parquet scan (no RDD
  * boundary, prunable); a vectored read EXPANDS (via the injected
  * ExpandTxLogDvScan rule) into the same broadcast LeftAnti plan
  * `TxLog.read` builds; the TableScan fallback stays correct for
  * extension-less sessions.
  */
class TxLogRelationSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("txrel").toString + "/t"

  private def rows(r: Range): org.apache.spark.sql.DataFrame =
    r.map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "payload", "grp")

  private def ids(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.select("id").as[Long].collect().sorted

  private def fmt(path: String) =
    spark.read.format("graft-txlog").option("path", path)

  test("format read == TxLog.read on a plain table; plan is the native parquet scan") {
    val path = freshPath()
    TxLog.init(rows(0 until 300).repartitionByRange(4, col("id")), path)
    TxLog.append(rows(300 until 400), path, 0L)
    val viaFmt = fmt(path).load()
    ids(viaFmt) shouldBe ids(TxLog.read(spark, path))
    viaFmt.schema.fieldNames shouldBe Array("id", "payload", "grp")
    // native file-source plan: parquet scan leaf, no RDD-boundary scan,
    // no join — the zero-overhead claim for vector-less tables
    viaFmt.collect()
    val plan = viaFmt.queryExecution.executedPlan.toString
    plan should include("FileScan parquet")
    (plan should not).include("ExistingRDD")
    (plan should not).include("Join")
    // filter pushdown reaches the scan (the reason the native shape wins)
    val filtered = fmt(path).load().filter(col("id") >= 350L)
    filtered.collect().length shouldBe 50
    filtered.queryExecution.executedPlan.toString should include("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,350)")
  }

  test("format read of a DV'd snapshot: expansion plans the broadcast anti-join, values == TxLog.read") {
    val path = freshPath()
    TxLog.init(rows(0 until 400).repartitionByRange(8, col("id")), path)
    TxLog.deleteWhereDV(spark, path, col("id") % 7 === 3, 0L)
    val viaFmt = fmt(path).load()
    ids(viaFmt) shouldBe ids(TxLog.read(spark, path))
    viaFmt.collect()
    val plan = viaFmt.queryExecution.executedPlan.toString
    // the DV anti-join appears THROUGH the format read (expansion fired;
    // not the opaque TableScan fallback)
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
    (plan should not).include("ExistingRDD")
    (plan should not).include("ShuffleExchange")
  }

  test("TableScan fallback (extension-less sessions) serves the same DV'd rows") {
    val path = freshPath()
    TxLog.init(rows(0 until 200).repartitionByRange(4, col("id")), path)
    TxLog.deleteWhereDV(spark, path, col("id") < 50L, 0L)
    val rel = graft.streaming.TxLogRelation.batchRelation(
      spark.sqlContext, Map("path" -> path), None)
    val dv = rel.asInstanceOf[graft.streaming.TxLogDvRelation]
    val got = dv.buildScan().map(_.getLong(0)).collect().sorted
    got shouldBe (50L until 200L).toArray
  }

  test("versionAsOf / timestampAsOf options; mutual exclusion; DV state versioned") {
    val path = freshPath()
    var t = 1000L
    TxLog.usingClock(() => { t += 60000L; t }) {
      TxLog.init(rows(0 until 100).repartitionByRange(2, col("id")), path) // v0 @ 61000
      TxLog.append(rows(100 until 200), path, 0L)                          // v1 @ 121000
      TxLog.deleteWhereDV(spark, path, col("id") < 10L, 1L)                // v2 @ 181000
    }
    ids(fmt(path).option("versionAsOf", "1").load()) shouldBe
      (0L until 200L).toArray
    ids(fmt(path).option("versionAsOf", "2").load()) shouldBe
      (10L until 200L).toArray
    // timestamp between v1 and v2 resolves to v1
    ids(fmt(path).option("timestampAsOf", "150000").load()) shouldBe
      (0L until 200L).toArray
    ids(fmt(path).option("timestampAsOf", "181000").load()) shouldBe
      (10L until 200L).toArray
    // wall-clock literal form (UTC): 181000 ms = 1970-01-01 00:03:01
    ids(fmt(path).option("timestampAsOf", "1970-01-01 00:03:01").load()) shouldBe
      (10L until 200L).toArray
    val e = intercept[IllegalArgumentException] {
      fmt(path).option("versionAsOf", "1")
        .option("timestampAsOf", "150000").load()
    }
    e.getMessage should include("mutually exclusive")
  }

  test("SQL over a catalog-registered TxLog table; schema evolution refuses with guidance") {
    val path = freshPath()
    TxLog.init(rows(0 until 150).repartitionByRange(2, col("id")), path)
    TxLog.deleteWhereDV(spark, path, col("id") % 3 === 0, 0L)
    spark.sql("DROP TABLE IF EXISTS txrel_cat")
    spark.sql(s"CREATE TABLE txrel_cat USING `graft-txlog` OPTIONS (path '$path')")
    try {
      val viaSql = spark.sql(
        "SELECT grp, count(*) AS cnt FROM txrel_cat GROUP BY grp")
      val direct = TxLog.read(spark, path)
        .groupBy("grp").agg(count(lit(1)).as("cnt"))
      viaSql.collect().map(r => (r.getInt(0), r.getLong(1))).sorted shouldBe
        direct.collect().map(r => (r.getInt(0), r.getLong(1))).sorted
      // Spark caches the resolved relation per catalog table (standard
      // V1 behavior): after an EXTERNAL commit, REFRESH TABLE re-resolves
      // to the new snapshot — the same contract every file-source catalog
      // table has
      TxLog.append(rows(150 until 180), path, 1L)
      spark.sql("REFRESH TABLE txrel_cat")
      spark.sql("SELECT count(*) AS n FROM txrel_cat").head().getLong(0) shouldBe
        TxLog.read(spark, path).count()
      // WIDEN the table: the pinned catalog schema is now stale - the
      // read must refuse loudly (serving it would drop the new column)
      TxLog.append(rows(180 until 190).withColumn("extra", lit(1L)), path, 2L)
      spark.sql("REFRESH TABLE txrel_cat")
      val e = intercept[Exception] {
        spark.sql("SELECT count(*) FROM txrel_cat").collect()
      }
      e.getMessage should include("re-register")
      // re-registration serves the evolved schema
      spark.sql("DROP TABLE txrel_cat")
      spark.sql(s"CREATE TABLE txrel_cat USING `graft-txlog` OPTIONS (path '$path')")
      val evolved = spark.sql("SELECT id, extra FROM txrel_cat WHERE extra IS NOT NULL")
      evolved.collect().length shouldBe 10
    } finally spark.sql("DROP TABLE IF EXISTS txrel_cat")
  }

  test("empty (delete-all) version serves a schema-correct empty frame through the format") {
    val path = freshPath()
    TxLog.init(rows(0 until 50), path)
    TxLog.deleteWhere(spark, path, lit(true), 0L)
    val df = fmt(path).load()
    df.schema.fieldNames shouldBe Array("id", "payload", "grp")
    df.count() shouldBe 0L
  }
}
