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

  test("netpbm parser: real pixel decode, hostile inputs fall back cleanly") {
    // hand-built 2x2 P6: pixels (r,g,b) rows — channel sums exact
    val p6 = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val img = BinaryMedia.parsePnm(p6)
    img.width shouldBe 2
    img.height shouldBe 2
    img.channels shouldBe 3
    img.channelSums.toSeq shouldBe Seq(10L + 40 + 70 + 100, 20L + 50 + 80 + 110,
      30L + 60 + 90 + 120)
    // P5 single channel; high bytes must read unsigned
    val p5 = "P5\n3 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0xff.toByte, 0x80.toByte, 1)
    val g = BinaryMedia.parsePnm(p5)
    g.channels shouldBe 1
    g.channelSums.toSeq shouldBe Seq(255L + 128 + 1)
    // hostile inputs → null (fake fallback), never a throw
    BinaryMedia.parsePnm(null) shouldBe null
    BinaryMedia.parsePnm(Array.emptyByteArray) shouldBe null
    BinaryMedia.parsePnm("P6\n2 2\n255\n".getBytes("US-ASCII")) shouldBe null // truncated
    BinaryMedia.parsePnm(p6.dropRight(1)) shouldBe null                       // short payload
    BinaryMedia.parsePnm((p6.toSeq :+ 0.toByte).toArray) shouldBe null        // long payload
    BinaryMedia.parsePnm("P7\n2 2\n255\n----".getBytes("US-ASCII")) shouldBe null
    BinaryMedia.parsePnm("P6\n-2 2\n255\n".getBytes("US-ASCII")) shouldBe null
    BinaryMedia.parsePnm("plain text that is not an image".getBytes("US-ASCII")) shouldBe null
  }

  test("synthetic netpbm round-trip: generator bytes decode to the closed-form sums") {
    val ids = (0L until 16L).toDF("doc_id")
    val decoded = BinaryMedia.decodeBatch(
      BinaryMedia.attachSyntheticPnm(ids, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 16L) {
      val r = decoded(id)
      val ch = if (id % 2 == 0) 3 else 1
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      withClue(s"id=$id: ") {
        r.getInt(1) shouldBe w
        r.getInt(2) shouldBe h
        r.getInt(3) shouldBe ch
        val expected = Array.fill(ch)(0L)
        for (j <- 0 until w * h * ch)
          expected(j % ch) += ((id * 31 + 7 + 7L * j) % 256)
        r.getAs[Seq[Double]](4) shouldBe expected.map(_.toDouble).toSeq
      }
    }
  }
}
