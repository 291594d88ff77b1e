package graft.gold

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed serving layout for the gold layer — the repeated-join
  * optimization: when the same dim⋈fact / fact⋈fact joins run on every
  * dashboard refresh, pre-shuffling ONCE at publish time beats paying the
  * exchange on every query.
  *
  * `publish` writes a managed table bucketed AND sorted by the join key:
  * two tables bucketed on the same key with the same bucket count
  * sort-merge-join with ZERO Exchange on either side (asserted in
  * `BucketedLayoutSpec` against the real pipeline tables), and a
  * `groupBy(key)` on a bucketed table aggregates without a shuffle.
  *
  * At 100 TB: bucket counts size the per-bucket file to the executor
  * (bucketsFor targets ~1 GB parquet per bucket); the publish-time
  * shuffle is paid once per load, then every downstream join of the
  * serving workload is exchange-free. Bucket pruning additionally skips
  * buckets on point-lookups (key = literal). This is exactly the Spark
  * rendition of the reference warehouse's distribution-key tables.
  */
object BucketedLayout {

  /** Publish a gold DataFrame as a bucketed+sorted managed table.
    * Overwrites any previous publication (idempotent re-run, C6).
    */
  def publish(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Bucket count sized to ~targetBytes of input per bucket (before
    * compression), minimum `minBuckets` for parallelism.
    */
  def bucketsFor(inputBytes: Long, targetBytes: Long = 1L << 30,
      minBuckets: Int = 32): Int =
    math.max(minBuckets, ((inputBytes + targetBytes - 1) / targetBytes).toInt)
}
