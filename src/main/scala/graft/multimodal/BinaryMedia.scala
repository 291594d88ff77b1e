package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque
  * `BinaryType` columns with typed metadata, and decode/feature-extract
  * runs batch-wise per partition.
  *
  * The actual codec step is a STUB (this environment ships no image/audio
  * libraries): `decodeBatch` produces a deterministic fake. Everything
  * around it — schema, batched partition iteration, metadata extraction —
  * is the real Spark shape: swap `fakeDecode` for a JNI/FFM codec call and
  * the pipeline is production-ready. At scale the partition batching is
  * what matters: one codec context per partition, not per row, and binary
  * columns never pass through a shuffle unless the plan demands it.
  */
object BinaryMedia {

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

  /** STUB decode: deterministic fake "image" dimensions + an 8-dim feature
    * from the byte content. Replace the body marked below with a real
    * codec (libjpeg/ffmpeg via FFM) — the batching contract stays.
    */
  def decodeBatch(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col("media"))
    val rdd = input.rdd.mapPartitions { rows =>
      // One "codec context" per partition (stubbed as a no-op); rows are
      // processed in batches the way a vectorized decoder would. Null ids
      // are dropped (nothing to key the decode on); null media decodes as
      // an empty payload rather than NPE-ing the task.
      rows.filter(!_.isNullAt(0)).grouped(64).flatMap { batch =>
        batch.map { r =>
          val id    = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
                      else r.getAs[Array[Byte]](1)
          // --- STUB: real decode goes here -------------------------------
          val width    = 64 + (math.abs(id) % 577).toInt
          val height   = 64 + (bytes.length % 479)
          val channels = 3
          val feature = Array.tabulate(8) { i =>
            if (bytes.isEmpty) 0.0
            else bytes.iterator.zipWithIndex
              .filter(_._2 % 8 == i).map(_._1.toInt & 0xff).sum.toDouble
          }
          // ----------------------------------------------------------------
          Row(id, width, height, channels, feature)
        }
      }
    }
    spark.createDataFrame(rdd, DecodedSchema)
  }
}
