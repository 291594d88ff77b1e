package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStream

final case class DocIngest(doc_id: Long, text: String)

class DedupIngestStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("continuous-ingest dedup: novel docs accepted + indexed, near-dups of EARLIER batches routed out") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val (store, accept, dup, ckpt) =
      (s"$root/store", s"$root/accept", s"$root/dup", s"$root/ckpt")
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[DocIngest]
    val q = EventStream.dedupIngestStream(
      input.toDF(), "doc_id", "text", store, accept, dup, ckpt, minJaccard = 0.5)
    try {
      // batch 0: empty store — everything is novel
      input.addData(
        DocIngest(1L, base),
        DocIngest(2L, "completely different content about spark engines"))
      q.processAllAvailable()
      // batch 1: 10 near-dups accepted doc 1; 11 is genuinely new
      input.addData(
        DocIngest(10L, base + " tonight"),
        DocIngest(11L, "fresh unrelated vocabulary nothing in common"))
      q.processAllAvailable()
      // batch 2: near-dup of doc 11 — accepted only one batch ago, proving
      // the store GROWS with accepted docs
      input.addData(DocIngest(20L, "fresh unrelated vocabulary nothing in common at all"))
      q.processAllAvailable()
    } finally q.stop()

    val accepted = spark.read.parquet(accept).select("doc_id").as[Long].collect().toSet
    val dups     = spark.read.parquet(dup).select("doc_id").as[Long].collect().toSet
    accepted shouldBe Set(1L, 2L, 11L)
    dups shouldBe Set(10L, 20L)
    // the signature store holds exactly the accepted docs
    spark.read.parquet(store).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L, 11L)
  }
}
