package graft

import graft.multimodal.BinaryMedia

class BinaryMediaSpec extends SparkSpecBase {
  import spark.implicits._

  test("media plumbing: binary column, metadata, batched stub decode") {
    val df = Seq((1L, "hello"), (2L, "a much longer document body here"))
      .toDF("doc_id", "text")
    val media = BinaryMedia.withMediaMeta(BinaryMedia.attachMedia(df, "text"))
    val meta = media.select("doc_id", "media_bytes", "media_header")
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    meta(1L) shouldBe ((5L, "68656c6c")) // "hell" in hex
    meta(2L)._1 shouldBe 32L

    val decoded = BinaryMedia.decodeBatch(media, "doc_id")
    decoded.schema shouldBe BinaryMedia.DecodedSchema
    val d = decoded.collect().map(r => r.getLong(0) -> r).toMap
    d(1L).getInt(1) shouldBe 64 + 1 % 577          // width deterministic
    d(1L).getInt(2) shouldBe 64 + 5 % 479          // height from byte length
    d(1L).getInt(3) shouldBe 3
    d(1L).getAs[Seq[Double]](4).length shouldBe 8
    // determinism: re-decode gives identical features
    val d2 = BinaryMedia.decodeBatch(media, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Seq[Double]](4)).toMap
    d2(2L) shouldBe d(2L).getAs[Seq[Double]](4)
  }
}
