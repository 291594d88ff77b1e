package graft

import org.apache.spark.sql.functions._

import graft.gold.TxLog

/** The DSv2 [[graft.sqlfront.GraftCatalog]] — TxLog tables as native V2
  * catalog tables (round-14 verdict item 5): CREATE/CTAS/INSERT/SELECT
  * with time travel, row-level DML through the SAME post-hoc rule as the
  * session-catalog seam, ALTER column + constraint DDL arriving as
  * native TableChanges (no parser interception for 3-part names), the
  * Delta-style path namespace, and the native-plan expansion (a catalog
  * SELECT explains to the parquet scan, not the V1Scan RDD fallback).
  */
class GraftCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val wh =
    java.nio.file.Files.createTempDirectory("graftcat").toString

  private lazy val child = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    s.conf.set("spark.sql.catalog.g", "graft.sqlfront.GraftCatalog")
    s.conf.set("spark.sql.catalog.g.warehouse", wh)
    // INSERT OVERWRITE through the V1 write bridge is whole-table
    // truncate-overwrite; DYNAMIC partition overwrite is not expressible
    // through it and fails with Spark's own named capability error —
    // partition-scoped replacement is replaceWherePartitions / the
    // delete_partitions procedure
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    s
  }

  test("CREATE (partitioned) + INSERT + SELECT + OVERWRITE + CTAS + " +
      "DROP through the V2 catalog; reads expand to the native plan") {
    child.sql("DROP TABLE IF EXISTS g.db.t1")
    child.sql("CREATE TABLE g.db.t1 (id BIGINT, grp STRING, cents BIGINT) " +
      "PARTITIONED BY (grp)")
    TxLog.snapshot(s"$wh/db/t1").partitionCols shouldBe Seq("grp")
    child.sql("INSERT INTO g.db.t1 VALUES (1, 'a', 10), (2, 'b', 20), " +
      "(3, 'a', 30)")
    child.sql("SELECT sum(cents) FROM g.db.t1 WHERE grp = 'a'")
      .as[Long].head() shouldBe 40L
    // the SELECT runs the NATIVE parquet plan, not the V1Scan fallback
    val df = child.sql("SELECT id, cents FROM g.db.t1")
    df.collect().length shouldBe 3
    val plan = df.queryExecution.executedPlan.toString
    plan should include("FileScan parquet")
    (plan should not).include("V1ScanWrapper")
    // INSERT OVERWRITE = the ACID overwrite commit
    child.sql("INSERT OVERWRITE g.db.t1 VALUES (9, 'z', 90)")
    child.sql("SELECT id, grp, cents FROM g.db.t1")
      .as[(Long, String, Long)].collect() shouldBe Array((9L, "z", 90L))
    TxLog.commitInfos(s"$wh/db/t1").flatMap(_.operation).head shouldBe
      "OVERWRITE"
    // CTAS
    child.sql("DROP TABLE IF EXISTS g.db.t2")
    child.sql("CREATE TABLE g.db.t2 AS SELECT id, cents * 2 AS c2 " +
      "FROM g.db.t1")
    child.sql("SELECT c2 FROM g.db.t2").as[Long].head() shouldBe 180L
    // catalog listing sees both tables; DROP removes one
    child.sql("SHOW TABLES IN g.db").as[(String, String, Boolean)]
      .collect().map(_._2).sorted should contain allOf ("t1", "t2")
    child.sql("DROP TABLE g.db.t2")
    TxLog.currentVersion(s"$wh/db/t2") shouldBe None
  }

  test("row-level DML through 3-part names: DELETE/UPDATE/conditional " +
      "MERGE/IN-subquery hit the same DV committers as the V1 seam") {
    child.sql("DROP TABLE IF EXISTS g.db.dml")
    child.sql("CREATE TABLE g.db.dml (id BIGINT, cents BIGINT)")
    val path = s"$wh/db/dml"
    child.sql("INSERT INTO g.db.dml SELECT id, id * 10 FROM range(40)")
    val filesBefore = TxLog.snapshot(path).files.toSet
    child.sql("DELETE FROM g.db.dml WHERE id % 4 = 0")
    child.sql("UPDATE g.db.dml SET cents = cents + 1 WHERE id % 4 = 1")
    // soft mechanics: deletion vectors, not rewrites
    filesBefore.subsetOf(TxLog.snapshot(path).files.toSet) shouldBe true
    child.sql("CREATE OR REPLACE TEMPORARY VIEW v2_mrg_src AS " +
      "SELECT * FROM VALUES (1L, 5L), (2L, 6L), (100L, 7L) AS v(sid, delta)")
    child.sql(
      """MERGE INTO g.db.dml AS t USING v2_mrg_src ON t.id = v2_mrg_src.sid
        |WHEN MATCHED AND v2_mrg_src.delta % 2 = 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET cents = t.cents + v2_mrg_src.delta
        |WHEN NOT MATCHED THEN INSERT (id, cents)
        |  VALUES (v2_mrg_src.sid, v2_mrg_src.delta)""".stripMargin)
    child.sql("DELETE FROM g.db.dml WHERE id IN " +
      "(SELECT id FROM g.db.dml WHERE cents % 10 = 1) AND id < 20")
    // model: range(40) minus %4=0; %4=1 get +1; merge: id1 +5, id2
    // deleted (delta even), id100 inserted; IN-delete kills cents%10=1
    // with id<20 (the %4=1 bumped rows below 20, except id1 now 16)
    val model = (0L until 40L).filterNot(_ % 4 == 0)
      .map(i => i -> (i * 10 + (if (i % 4 == 1) 1L else 0L))).toMap
      .++(Seq(1L -> 16L, 100L -> 7L)).--(Seq(2L))
      .filterNot { case (k, c) => c % 10 == 1 && k < 20 }
    child.sql("SELECT id, cents FROM g.db.dml")
      .as[(Long, Long)].collect().sortBy(_._1) shouldBe
      model.toArray.sortBy(_._1)
    TxLog.commitInfos(path).flatMap(_.operation) should contain ("MERGE_DV")
  }

  test("native ALTER: ADD COLUMNS / RENAME / DROP COLUMN / constraints " +
      "arrive as TableChanges; time travel via VERSION AS OF") {
    child.sql("DROP TABLE IF EXISTS g.db.ddl")
    child.sql("CREATE TABLE g.db.ddl (id BIGINT, cents BIGINT)")
    val path = s"$wh/db/ddl"
    child.sql("INSERT INTO g.db.ddl SELECT id, id FROM range(10)") // v1
    child.sql("ALTER TABLE g.db.ddl ADD COLUMNS (flag BIGINT)")    // v2
    child.sql("SELECT flag FROM g.db.ddl").collect()
      .forall(_.isNullAt(0)) shouldBe true
    child.sql("ALTER TABLE g.db.ddl RENAME COLUMN cents TO amount") // v3
    child.sql("SELECT sum(amount) FROM g.db.ddl").as[Long].head() shouldBe 45L
    child.sql("ALTER TABLE g.db.ddl DROP COLUMN flag")              // v4
    child.sql("SELECT * FROM g.db.ddl").columns.sorted shouldBe
      Array("amount", "id")
    // constraints through the native TableChange path
    child.sql("ALTER TABLE g.db.ddl ADD CONSTRAINT amt_pos " +
      "CHECK (amount >= 0)")                                        // v5
    intercept[Exception] {
      child.sql("INSERT INTO g.db.ddl VALUES (99, -5)")
    }.getMessage should include("amt_pos")
    child.sql("ALTER TABLE g.db.ddl DROP CONSTRAINT amt_pos")       // v6
    child.sql("INSERT INTO g.db.ddl VALUES (99, -5)")               // v7
    child.sql("SELECT count(*) FROM g.db.ddl WHERE amount < 0")
      .as[Long].head() shouldBe 1L
    // time travel: before the rename the column was 'cents'
    child.sql("SELECT sum(cents) FROM g.db.ddl VERSION AS OF 1")
      .as[Long].head() shouldBe 45L
    child.sql("SELECT count(*) FROM g.db.ddl VERSION AS OF 1")
      .as[Long].head() shouldBe 10L
    // a frozen view refuses DML (same contract as the V1 seam)
    intercept[Exception] {
      child.sql("DELETE FROM g.db.ddl VERSION AS OF 1 WHERE id = 1")
        .collect()
    }
    TxLog.snapshot(path).physTombstones should not be empty
  }

  test("path namespace addresses existing TxLog dirs with zero " +
      "registration; procedures ride the same catalog") {
    val dir = java.nio.file.Files.createTempDirectory("gcatpath")
      .toString + "/t"
    TxLog.init((0L until 20L).map(i => (i, i * 2)).toDF("id", "v")
      .repartition(2), dir)
    child.sql(s"SELECT sum(v) FROM g.path.`$dir`")
      .as[Long].head() shouldBe (0L until 20L).map(_ * 2).sum
    child.sql(s"DELETE FROM g.path.`$dir` WHERE id >= 10")
    child.sql(s"SELECT count(*) FROM g.path.`$dir`")
      .as[Long].head() shouldBe 10L
    // the inherited procedure surface under the same catalog name
    child.sql(s"CALL g.system.history(path => '$dir')")
      .count() should be >= 2L
    // DROP on the path namespace must never delete the external dir
    intercept[Exception] {
      child.sql(s"DROP TABLE g.path.`$dir`")
    }.getMessage should include("external directory")
    TxLog.currentVersion(dir).isDefined shouldBe true
    // explicit LOCATION on a managed create refuses (no metastore to
    // persist the mapping - the table would be unfindable)
    intercept[Exception] {
      child.sql("CREATE TABLE g.db.ext (id BIGINT) LOCATION '/tmp/ext_x'")
    }.getMessage should include("LOCATION")
  }
}
