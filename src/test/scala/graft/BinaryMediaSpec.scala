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

  test("four-format round-trip: ppm/pgm/png/bmp all decode to the same closed-form sums") {
    val ids = (0L until 16L).toDF("doc_id")
    val decoded = BinaryMedia.decodeBatch(
      BinaryMedia.attachSyntheticImages(ids, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 16L) {
      val r = decoded(id)
      val ch = if (id % 4 == 1) 1 else 3
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      withClue(s"id=$id (${id % 4} format class): ") {
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

  test("jpeg decode: dims exact, uniform-gray sums within the DC-quantization band") {
    val ids = (0L until 12L).toDF("doc_id")
    val decoded = BinaryMedia.decodeBatch(
      BinaryMedia.attachSyntheticJpeg(ids, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 12L) {
      val r = decoded(id)
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val v = ((id * 31 + 7) % 256).toInt
      withClue(s"id=$id: ") {
        r.getInt(1) shouldBe w
        r.getInt(2) shouldBe h
        r.getInt(3) shouldBe 3
        r.getAs[Seq[Double]](4).foreach { s =>
          math.abs(s - v.toLong * w * h) should be <= (8.0 * w * h)
        }
      }
    }
  }

  test("gif decodes losslessly through the palette; hostile image bytes fall back") {
    // 2x2, two colors in an EXPLICIT palette — the JDK GIF encoder
    // quantizes truecolor input to a web-safe palette (lossy!), but an
    // indexed source image carries its palette through verbatim
    val cmap = Array(0x102030, 0x405060)
    val icm = new java.awt.image.IndexColorModel(1, 2,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.setRGB(0, 0, 0x102030); img.setRGB(1, 0, 0x405060)
    img.setRGB(0, 1, 0x102030); img.setRGB(1, 1, 0x405060)
    // the JDK's DEFAULT gif write emits a broken interlaced stream (rows
    // land out of order on read-back — verified directly); write
    // non-progressive, which every mainstream encoder produces anyway
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = wr.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wr.dispose()
    val parsed = BinaryMedia.parseJdkImage(bos.toByteArray)
    parsed.width shouldBe 2
    parsed.height shouldBe 2
    parsed.channels shouldBe 3
    parsed.channelSums.toSeq shouldBe Seq(2L * (0x10 + 0x40),
      2L * (0x20 + 0x50), 2L * (0x30 + 0x60))
    // PNG magic with garbage body → null, never a throw; foreign bytes → null
    BinaryMedia.parseJdkImage(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4)) shouldBe null
    BinaryMedia.parseJdkImage("not an image at all".getBytes("US-ASCII")) shouldBe null
    BinaryMedia.parseJdkImage(null) shouldBe null
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

  test("wav decode: synthetic PCM round-trips to closed-form sample sums; non-wav is null-shaped") {
    import spark.implicits._
    // direct parser round-trip over both channel classes and all rates
    for (id <- 0L until 24L) {
      val wav = BinaryMedia.parseWav(BinaryMedia.syntheticWavBytes(id))
      val ch = (1 + id % 2).toInt
      val frames = 16 + id % 17
      withClue(s"id=$id: ") {
        wav should not be null
        wav.channels shouldBe ch
        wav.sampleRate shouldBe (8000 + 4000 * (id % 3)).toInt
        wav.frames shouldBe frames
        val expected = Array.fill(ch)(0L)
        for (k <- 0 until (frames * ch).toInt)
          expected(k % ch) += ((id * 31 + 7 + 7L * k) % 65536) - 32768
        wav.channelSums.toSeq shouldBe expected.toSeq
      }
    }
    // hostile inputs: truncated header, image bytes, empty
    BinaryMedia.parseWav(Array[Byte]('R', 'I', 'F', 'F')) shouldBe null
    BinaryMedia.parseWav(BinaryMedia.syntheticPnmBytes(3L)) shouldBe null
    BinaryMedia.parseWav(Array.emptyByteArray) shouldBe null
    // a truncated wav (header promises more data than present) must not throw
    val whole = BinaryMedia.syntheticWavBytes(5L)
    BinaryMedia.parseWav(java.util.Arrays.copyOf(whole, whole.length - 3))
    // distributed batch path: decode through decodeAudioBatch
    val ids = (0L until 8L).toDF("doc_id")
    val rows = BinaryMedia.decodeAudioBatch(
      BinaryMedia.attachSyntheticWav(ids, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    rows(2L).getInt(1) shouldBe 1
    rows(3L).getInt(1) shouldBe 2
    rows(3L).getAs[Seq[Long]](4).length shouldBe 2
    // non-wav media yields a null-shaped row, not an exception
    val bad = BinaryMedia.decodeAudioBatch(
      BinaryMedia.attachSyntheticPnm(ids, "doc_id"), "doc_id").collect()
    bad.foreach(r => r.isNullAt(1) shouldBe true)
  }
}
