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

  test("replayed batch ignores its own crashed-attempt store partition — split is stable") {
    val root = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val (store, accept, dup) = (s"$root/store", s"$root/accept", s"$root/dup")
    // Batch 0: two docs that near-dup EACH OTHER but nothing historical —
    // within-batch dups are out of scope, so both must be accepted.
    val b0 = Seq(
      DocIngest(100L, "the quick brown fox jumps over the lazy dog again today"),
      DocIngest(101L, "the quick brown fox jumps over the lazy dog again tonight")
    ).toDF()
    EventStream.dedupIngestBatch(b0, 0L, "doc_id", "text", store, accept, dup,
      minJaccard = 0.5)
    // Crash before the checkpoint committed: batch 0 is REDELIVERED. Its
    // own store partition (batch_id=0) now exists on disk — the replay must
    // not join against it, or both docs would flip to "duplicate".
    EventStream.dedupIngestBatch(b0, 0L, "doc_id", "text", store, accept, dup,
      minJaccard = 0.5)
    spark.read.parquet(accept).select("doc_id").as[Long].collect().toSet shouldBe
      Set(100L, 101L)
    spark.read.parquet(store).select("doc_id").as[Long].collect().toSet shouldBe
      Set(100L, 101L)
    spark.read.parquet(s"$dup/batch_id=0").count() shouldBe 0
    // and a LATER batch does see batch 0's store contribution
    val b1 = Seq(DocIngest(200L,
      "the quick brown fox jumps over the lazy dog again tomorrow")).toDF()
    EventStream.dedupIngestBatch(b1, 1L, "doc_id", "text", store, accept, dup,
      minJaccard = 0.5)
    spark.read.parquet(dup).select("doc_id").as[Long].collect().toSet shouldBe
      Set(200L)
  }

  test("store/batch hashing-mode mismatch fails loudly instead of silent zero recall") {
    val store = graft.dedup.NearDup.minhashSignatureStore(
      Seq((1L, "some historical document text here")).toDF("doc_id", "text"),
      "doc_id", "text", fastHashing = true)
    val batch = Seq((2L, "some historical document text here too")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      graft.dedup.NearDup.dedupAgainstStore(store, batch, "doc_id", "text").count()
    }
    ex.getMessage should include("hash_mode")
  }
}
