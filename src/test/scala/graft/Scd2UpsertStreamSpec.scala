package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.gold.Scd2
import graft.streaming.EventStream

final case class DimChange(cust_id: Long, changed_ts: Timestamp, tier: String)

class Scd2UpsertStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val NK = Seq("cust_id")
  private val ATTRS = Seq("tier")

  private def dimRows(path: String): Set[(Long, Timestamp, String, Timestamp, Timestamp, Boolean)] =
    spark.read.parquet(path)
      .select("cust_id", "changed_ts", "tier",
        "effective_start_ts", "effective_end_ts", "is_current")
      .as[(Long, Timestamp, String, Timestamp, Timestamp, Boolean)]
      .collect().toSet

  test("streaming SCD2 upsert equals the batch rebuild; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dim = java.nio.file.Files.createTempDirectory("graft_dim").toString + "/dim_customer"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[DimChange]
    val q = EventStream.scd2UpsertStream(
      input.toDF(), dim, ckpt, NK, "changed_ts", ATTRS)
    val batch1 = Seq(
      DimChange(1L, ts("2024-01-01 00:00:00"), "bronze"),
      DimChange(2L, ts("2024-01-01 00:00:00"), "silver"))
    val batch2 = Seq(
      DimChange(1L, ts("2024-02-01 00:00:00"), "gold"),   // tier change → new version
      DimChange(2L, ts("2024-02-01 00:00:00"), "silver"), // no change → collapsed
      DimChange(3L, ts("2024-02-01 00:00:00"), "bronze")) // new key
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      dimRows(dim).map(r => (r._1, r._3, r._6)) shouldBe
        Set((1L, "bronze", true), (2L, "silver", true))

      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = dimRows(dim)
    // batch-equivalence: the streamed dim is exactly the one-shot rebuild
    // over the concatenated change history
    val expected = Scd2.initialLoad(
      (batch1 ++ batch2).toDF(), NK, "changed_ts", ATTRS)
      .select("cust_id", "changed_ts", "tier",
        "effective_start_ts", "effective_end_ts", "is_current")
      .as[(Long, Timestamp, String, Timestamp, Timestamp, Boolean)]
      .collect().toSet
    got shouldBe expected
    got.count(_._6) shouldBe 3 // one current row per key
    // cust 1 history: bronze closed at the gold version's start
    val c1 = got.filter(_._1 == 1L)
    c1.map(_._3) shouldBe Set("bronze", "gold")
    c1.find(_._3 == "bronze").get._5 shouldBe ts("2024-02-01 00:00:00")

    // exactly-once EFFECT: re-merging the already-applied batch (the
    // restart redelivery case) converges to the identical dim
    val replayed = Scd2.incrementalMerge(
      spark.read.parquet(dim), batch2.toDF(), NK, "changed_ts", ATTRS)
      .select("cust_id", "changed_ts", "tier",
        "effective_start_ts", "effective_end_ts", "is_current")
      .as[(Long, Timestamp, String, Timestamp, Timestamp, Boolean)]
      .collect().toSet
    replayed shouldBe got
  }

  test("crash between swap renames: the .bak is recovered, history is NOT lost") {
    val dim = java.nio.file.Files.createTempDirectory("graft_dimc").toString + "/dim"
    val b1 = Seq(
      DimChange(1L, ts("2024-01-01 00:00:00"), "bronze"),
      DimChange(2L, ts("2024-01-01 00:00:00"), "silver")).toDF()
    EventStream.scd2UpsertBatch(b1, 0L, dim, NK, "changed_ts", ATTRS)
    dimRows(dim).size shouldBe 2

    // Simulate a crash after `dim → .bak` but before `tmp → dim`: the dim
    // directory is gone and only the .bak holds the history.
    val dir = new java.io.File(dim)
    val bak = new java.io.File(dim + ".bak")
    assert(dir.renameTo(bak))
    dir.exists() shouldBe false

    // The replayed batch must recover the .bak and MERGE — the naive
    // rebuild-from-batch would produce a dim with only cust 3.
    val b2 = Seq(DimChange(3L, ts("2024-02-01 00:00:00"), "gold")).toDF()
    EventStream.scd2UpsertBatch(b2, 1L, dim, NK, "changed_ts", ATTRS)
    dimRows(dim).map(_._1) shouldBe Set(1L, 2L, 3L)
    bak.exists() shouldBe false // swap completed, step-aside cleaned up
  }
}
