package graft

import org.apache.spark.sql.functions._

/** Catalog lifecycle: registration caching, explicit re-crawl on schema
  * evolution (`refreshCatalog`), and no-caching-of-failures (a throwing
  * DDL run must not poison the cache — the next caller retries).
  */
class SqlFrontCatalogSpec extends SparkSpecBase {

  /** Mutable copy of the smallest testdata dir (registration pins schemas
    * to locations, so evolution tests need a dir they may rewrite).
    */
  private def copyTestdata(): String = {
    val src = new java.io.File("/root/testdata/sf0.001")
    val dst = java.nio.file.Files.createTempDirectory("catalog_sf").toFile
    def copy(f: java.io.File, to: java.io.File): Unit =
      if (f.isDirectory) {
        to.mkdirs()
        f.listFiles().foreach(c => copy(c, new java.io.File(to, c.getName)))
      } else { java.nio.file.Files.copy(f.toPath, to.toPath); () }
    src.listFiles().foreach(c => copy(c, new java.io.File(dst, c.getName)))
    dst.toString
  }

  test("refreshCatalog re-crawls an evolved table schema; plain calls stay cached") {
    val dir = copyTestdata()
    val s = graft.sqlfront.SqlFront.registerCatalog(spark, dir)
    s.sql("SELECT * FROM orders").columns should not contain "o_priority_rank"
    // evolve the layer output: orders gains a column (q_s14 shape)
    val tmp = java.nio.file.Files.createTempDirectory("orders_evolved").toString
    s.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_priority_rank", lit(1))
      .write.mode("overwrite").parquet(tmp)
    graft.core.Fs.rmTree(new java.io.File(s"$dir/orders.parquet"))
    new java.io.File(tmp).renameTo(
      new java.io.File(s"$dir/orders.parquet")) shouldBe true
    // cached registration serves the create-time schema (the documented
    // trade: no DDL churn per query)...
    val s2 = graft.sqlfront.SqlFront.registerCatalog(spark, dir)
    s2.sql("SELECT * FROM orders").columns should not contain "o_priority_rank"
    // ...and the explicit re-crawl sees the new column without restart
    val s3 = graft.sqlfront.SqlFront.refreshCatalog(spark, dir)
    s3.sql("SELECT * FROM orders").columns should contain("o_priority_rank")
    s3.sql("SELECT count(*) AS n FROM orders").head().getLong(0) should be > 0L
  }

  test("a failed registration is not cached: the next call retries the DDL") {
    val dir = copyTestdata()
    val ev = new java.io.File(s"$dir/events.parquet")
    val hidden = new java.io.File(s"$dir/events.hidden")
    ev.renameTo(hidden) shouldBe true
    intercept[Exception] {
      graft.sqlfront.SqlFront.refreshCatalog(spark, dir)
    }
    hidden.renameTo(ev) shouldBe true
    val s = graft.sqlfront.SqlFront.registerCatalog(spark, dir)
    s.sql("SELECT count(*) AS n FROM graft.events").head().getLong(0) should be > 0L
  }
}
