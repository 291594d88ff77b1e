package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque
  * `BinaryType` columns with typed metadata, and decode/feature-extract
  * runs batch-wise per partition.
  *
  * `decodeBatch` decodes images with REAL pixel work, two codecs deep:
  * PPM/PGM (P6/P5 binary netpbm) through the hand-rolled pure-JVM parser,
  * and JPEG/PNG/BMP/GIF through `javax.imageio`'s pure-JDK headless
  * plugins (no native libraries) — header parse, dimension extraction,
  * exact per-channel pixel sums. Gated as `q_x_multimodal_decode` (four
  * container formats, one closed-form DuckDB oracle over dims + channel
  * sums) and `q_x_multimodal_decode_jpeg` (lossy path, bound-boolean
  * oracle). Only audio/unknown containers fall through to the
  * deterministic pseudo-decode (no JVM codec exists for them); swap that
  * branch for an FFM call and the pipeline is production-ready. At scale
  * the partition batching is what matters: one codec context per
  * partition, not per row, and binary columns never pass through a
  * shuffle unless the plan demands it.
  */
object BinaryMedia {

  /** Parsed netpbm image: dims + per-channel payload byte sums (the
    * feature every mean/normalize step starts from; sums stay exact).
    */
  final case class PnmImage(width: Int, height: Int, channels: Int,
      channelSums: Array[Long])

  /** Pure-JVM P6 (PPM, 3-channel) / P5 (PGM, 1-channel) binary decoder,
    * maxval <= 255, comment-free headers (the subset every camera/ffmpeg
    * `-f image2 -c:v ppm` emit). Returns null for anything that is not a
    * complete, well-formed netpbm payload — the caller falls back to the
    * stub path, never throws.
    */
  def parsePnm(bytes: Array[Byte]): PnmImage = {
    if (bytes == null || bytes.length < 7 || bytes(0) != 'P') return null
    val channels = bytes(1) match {
      case '6' => 3
      case '5' => 1
      case _   => return null
    }
    // header: 3 whitespace-separated ints (w, h, maxval) then ONE
    // whitespace byte, then the raw payload
    var pos = 2
    val vals = new Array[Int](3)
    var vi = 0
    while (vi < 3) {
      while (pos < bytes.length && isPnmWs(bytes(pos))) pos += 1
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9') return null
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > 65535) return null
        pos += 1
      }
      vals(vi) = v
      vi += 1
    }
    if (pos >= bytes.length || !isPnmWs(bytes(pos))) return null
    pos += 1
    val (w, h, maxval) = (vals(0), vals(1), vals(2))
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return null
    val n = w.toLong * h * channels
    if (bytes.length - pos != n) return null
    val sums = new Array[Long](channels)
    var i = pos
    var c = 0
    while (i < bytes.length) {
      sums(c) += bytes(i) & 0xff
      c += 1
      if (c == channels) c = 0
      i += 1
    }
    PnmImage(w, h, channels, sums)
  }

  private def isPnmWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  // ImageIO's pure-JDK plugins (PNG/JPEG/BMP/GIF/WBMP) need no native
  // libraries; headless mode avoids any display dependency on executors
  java.lang.System.setProperty("java.awt.headless", "true")

  /** REAL JPEG/PNG/BMP/GIF decode via `javax.imageio` — pure-JDK plugins,
    * no native codecs. Magic-sniffed first so non-image bytes never pay a
    * decoder attempt. Grayscale images report 1 channel (raw band sums);
    * everything else is normalized to sRGB and reports 3 channels with
    * exact per-channel pixel sums (alpha, palettes, and exotic color
    * models all land in the same comparable feature space — the
    * normalization every vision preprocessing pipeline performs anyway).
    * Returns null for unreadable/foreign bytes; the caller falls through.
    */
  def parseJdkImage(bytes: Array[Byte]): PnmImage = {
    if (bytes == null || bytes.length < 4) return null
    val known =
      ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') ||              // PNG
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) ||    // JPEG
      (bytes(0) == 'B' && bytes(1) == 'M') ||                        // BMP
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')        // GIF
    if (!known) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (img.getColorModel.getNumComponents == 1) {
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      PnmImage(w, h, 1, Array(sum))
    } else {
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >>> 16) & 0xff
          sg += (rgb >>> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      PnmImage(w, h, 3, Array(sr, sg, sb))
    }
  }

  /** Parsed PCM WAV audio: stream shape + exact per-channel sample sums
    * (the feature every loudness/normalization step starts from).
    */
  final case class WavAudio(channels: Int, sampleRate: Int, frames: Long,
      channelSums: Array[Long])

  /** REAL WAV/PCM decode via `javax.sound.sampled` — pure-JDK, headless,
    * no native codecs (the same story as imageio for images; the round-6
    * "audio needs native codecs" claim was wrong for the RIFF/PCM
    * container too). RIFF magic-sniffed first; 16-bit signed PCM only
    * (the interchange format); returns null for anything else — callers
    * fall through, never throw.
    */
  def parseWav(bytes: Array[Byte]): WavAudio = {
    if (bytes == null || bytes.length < 44 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
        bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return null
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return null
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize // ch * 2 bytes
      val data = in.readAllBytes()
      if (frameSize <= 0 || data.length % frameSize != 0) return null
      val frames = data.length / frameSize
      val sums = new Array[Long](ch)
      val bigEndian = fmt.isBigEndian
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < ch) {
          val off = f * frameSize + c * 2
          val v =
            if (bigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
            else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
          sums(c) += v
          c += 1
        }
        f += 1
      }
      WavAudio(ch, fmt.getSampleRate.toInt, frames.toLong, sums)
    } finally in.close()
  }

  /** Deterministic synthetic 16-bit PCM WAV bytes for an id — hand-rolled
    * RIFF container so the DuckDB oracle can recompute every sample in
    * closed form: channels = 1 + id%2, sample rate = 8000 + 4000·(id%3),
    * frames = 16 + id%17, interleaved sample k =
    * ((id·31 + 7 + 7k) mod 65536) − 32768 (the image series' audio twin).
    */
  def syntheticWavBytes(id: Long): Array[Byte] = {
    val ch = (1 + id % 2).toInt
    val sr = (8000 + 4000 * (id % 3)).toInt
    val frames = (16 + id % 17).toInt
    val nSamples = frames * ch
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort).putInt(sr).putInt(sr * ch * 2)
      .putShort((ch * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < nSamples) {
      bb.putShort((((id * 31 + 7 + 7L * k) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /** Attach the synthetic WAV media column ([[syntheticWavBytes]]). */
  def attachSyntheticWav(df: DataFrame, idCol: String): DataFrame =
    attachGenerated(df, idCol, syntheticWavBytes)

  val DecodedAudioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("channel_sums", ArrayType(LongType))
  ))

  /** Batched AUDIO decode — the audio twin of [[decodeBatch]]: WAV/PCM
    * media decodes for REAL (container parse, stream shape, exact
    * per-channel sample sums); non-WAV bytes yield a null-shaped row (the
    * caller filters or routes). Same scale contract: one codec context
    * per partition, binary column never shuffled.
    */
  def decodeAudioBatch(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col("media"))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.filter(!_.isNullAt(0)).map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray
                    else r.getAs[Array[Byte]](1)
        val wav = parseWav(bytes)
        if (wav != null)
          Row(id, wav.channels, wav.sampleRate, wav.frames, wav.channelSums.toSeq)
        else Row(id, null, null, null, null)
      }
    }
    spark.createDataFrame(rdd, DecodedAudioSchema)
  }

  /** Deterministic synthetic netpbm bytes for an id — the test-data
    * stand-in for the object-storage read a production pipeline does
    * (the testdata ships no media files). Even ids render P6 (3-channel),
    * odd P5; payload byte j = (id*31 + 7 + 7j) mod 256, so the DuckDB
    * oracle can recompute the channel sums in closed form.
    */
  def syntheticPnmBytes(id: Long): Array[Byte] = {
    val channels = if (id % 2 == 0) 3 else 1
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val header = (if (channels == 3) "P6" else "P5") + "\n" + w + " " + h + "\n255\n"
    val hb = header.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = w * h * channels
    val out = java.util.Arrays.copyOf(hb, hb.length + n)
    var j = 0
    while (j < n) {
      out(hb.length + j) = ((id * 31 + 7 + 7L * j) % 256).toByte
      j += 1
    }
    out
  }

  /** Deterministic synthetic image bytes spanning FOUR real container
    * formats, one per id class: id%4 = 0 → P6 ppm, 1 → P5 pgm, 2 → PNG
    * (RGB), 3 → BMP (RGB). The PIXEL series is identical across
    * containers — RGB pixel p carries (series(3p), series(3p+1),
    * series(3p+2)) with series(j) = (id*31 + 7 + 7j) mod 256, exactly the
    * P6 payload layout — and PNG/BMP are lossless, so ONE closed-form
    * DuckDB oracle covers all four decode paths.
    */
  def syntheticImageBytes(id: Long): Array[Byte] = id % 4 match {
    case 0 | 1 => syntheticPnmBytes(id) // id%4∈{0,1} ⇒ even→P6 / odd→P5
    case m =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var p = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def series(j: Long): Int = ((id * 31 + 7 + 7 * j) % 256).toInt
          img.setRGB(x, y, (series(3L * p) << 16) |
            (series(3L * p + 1) << 8) | series(3L * p + 2))
          p += 1
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, if (m == 2) "png" else "bmp", bos)
      bos.toByteArray
  }

  /** Uniform-gray JPEG bytes: every pixel of the w×h frame is
    * (v, v, v) with v = (id*31 + 7) mod 256. JPEG is lossy, but a uniform
    * image quantizes only in the DC coefficient, so the decoded value
    * stays within a few levels of v — the decode gate bounds each channel
    * sum by ±8·w·h instead of demanding exactness.
    */
  def syntheticJpegBytes(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val v = ((id * 31 + 7) % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Attach the synthetic netpbm media column (see [[syntheticPnmBytes]]);
    * a production reader would load the bytes from object storage here.
    */
  def attachSyntheticPnm(df: DataFrame, idCol: String): DataFrame =
    attachGenerated(df, idCol, syntheticPnmBytes)

  /** Attach the four-format synthetic media column ([[syntheticImageBytes]]). */
  def attachSyntheticImages(df: DataFrame, idCol: String): DataFrame =
    attachGenerated(df, idCol, syntheticImageBytes)

  /** Attach the uniform-gray JPEG media column ([[syntheticJpegBytes]]). */
  def attachSyntheticJpeg(df: DataFrame, idCol: String): DataFrame =
    attachGenerated(df, idCol, syntheticJpegBytes)

  private def attachGenerated(df: DataFrame, idCol: String,
      gen: Long => Array[Byte]): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    require(idIdx >= 0, s"attachGenerated: no column $idCol")
    val schema = StructType(df.schema.fields :+
      StructField("media", org.apache.spark.sql.types.BinaryType))
    val rdd = df.rdd.map { r =>
      Row.fromSeq(r.toSeq :+ gen(r.getLong(idIdx)))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Attach an opaque binary media column (here derived from text — the
    * testdata has no real media; a production reader would load bytes from
    * object storage).
    */
  def attachMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("media", col(srcCol).cast("binary"))

  /** Cheap metadata that does NOT require decoding: byte length + header
    * bytes (hex). This is the "sniff the container format" step.
    */
  def withMediaMeta(df: DataFrame): DataFrame =
    df.withColumn("media_bytes", octet_length(col("media")).cast("long"))
      .withColumn("media_header", lower(substring(hex(col("media")), 1, 8)))

  /** Resize planning: aspect-preserving target dimensions to fit maxDim
    * (the arithmetic every image-resize pipeline runs before the codec
    * call; the pixel work itself belongs in the decodeBatch stub).
    * Pure integer/double expressions — deterministic.
    */
  def withResizeDims(decoded: DataFrame, maxDim: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxDim, lit(maxDim.toDouble) / longest).otherwise(1.0)
    // floor of 1: an extreme aspect ratio must not round the short side to
    // a zero-pixel target
    decoded
      .withColumn("resize_width",
        greatest(lit(1), round(col("width") * scale).cast("int")))
      .withColumn("resize_height",
        greatest(lit(1), round(col("height") * scale).cast("int")))
  }

  /** Frame sampling for video-like media: explode each media row into
    * `nFrames` frame rows with a deterministic pseudo-feature (the decode
    * itself is stubbed like `decodeBatch` — the one-to-many explode shape,
    * schema, and per-frame keying are the real Spark plumbing).
    */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int): DataFrame =
    df.select(col(idCol), col("media"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_feature",
        (coalesce(octet_length(col("media")).cast("long"), lit(0L)) * 31
          + col("frame_idx")) % 997)
      .drop("media")

  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(DoubleType))
  ))

  /** Batched decode. netpbm (P5/P6) media decodes for REAL — dimensions
    * from the header, per-channel byte sums from the payload (`feature` =
    * channel sums, length = channels). Other formats produce the
    * deterministic fake below (no native codecs in this environment);
    * replace that branch with a libjpeg/ffmpeg FFM call — the batching
    * contract stays.
    */
  def decodeBatch(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col("media"))
    val rdd = input.rdd.mapPartitions { rows =>
      // One codec context per partition; rows are processed in batches the
      // way a vectorized decoder would. Null ids are dropped (nothing to
      // key the decode on); null media decodes as an empty payload rather
      // than NPE-ing the task.
      rows.filter(!_.isNullAt(0)).grouped(64).flatMap { batch =>
        batch.map { r =>
          val id    = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
                      else r.getAs[Array[Byte]](1)
          val netpbm = parsePnm(bytes)
          val pnm = if (netpbm != null) netpbm else parseJdkImage(bytes)
          if (pnm != null)
            Row(id, pnm.width, pnm.height, pnm.channels,
              pnm.channelSums.map(_.toDouble))
          else {
            // --- opaque-media fallback (audio/unknown containers — the
            // only formats left without a JVM codec): deterministic
            // pseudo-features so downstream plumbing stays exercised -----
            val width    = 64 + (math.abs(id) % 577).toInt
            val height   = 64 + (bytes.length % 479)
            val channels = 3
            val feature = Array.tabulate(8) { i =>
              if (bytes.isEmpty) 0.0
              else bytes.iterator.zipWithIndex
                .filter(_._2 % 8 == i).map(_._1.toInt & 0xff).sum.toDouble
            }
            // -------------------------------------------------------------
            Row(id, width, height, channels, feature)
          }
        }
      }
    }
    spark.createDataFrame(rdd, DecodedSchema)
  }
}
