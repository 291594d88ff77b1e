package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hexHash48

/** Deterministic sampling, splitting, and mixture weighting — the
  * data-mixing operations of a training pipeline, built on a PORTABLE
  * content hash instead of `rand()`:
  *
  *  - reproducible across runs, engines, stage retries, and cluster sizes
  *    (a `rand()` sample changes under speculative execution and can't be
  *    oracle-verified);
  *  - membership is a pure function of the row key, so incremental re-runs
  *    make consistent decisions about previously-seen rows — exactly what
  *    train/val/test hygiene requires (a row can never migrate between
  *    splits when the corpus grows).
  *
  * The hash bucket is `hexHash48(key || salt) % 10000` (basis points).
  * All operators are narrow (no shuffle) — filters and generators only.
  */
object DeterministicSampling {

  val Buckets = 10000L

  /** Stable bucket in [0, 10000) from a key column and a salt (change the
    * salt to draw an independent sample).
    */
  def bucket(key: Column, salt: String): Column =
    hexHash48(concat(key.cast("string"), lit(salt))) % Buckets

  /** Keep ~`rateBp`/10000 of rows, deterministically by key. */
  def sample(df: DataFrame, key: Column, rateBp: Int, salt: String = "s0"): DataFrame =
    df.filter(bucket(key, salt) < rateBp)

  /** Per-stratum rates (basis points): the mixture-ratio operator — e.g.
    * downsample dominant languages, keep the tail.
    */
  def stratifiedSample(
      df: DataFrame,
      stratum: Column,
      key: Column,
      ratesBp: Map[String, Int],
      defaultBp: Int,
      salt: String = "s0"
  ): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(key, salt) < rate)
  }

  /** Disjoint train/val/test assignment (never-migrating membership).
    * Fractions in basis points; remainder is "train".
    */
  def split(
      df: DataFrame,
      key: Column,
      valBp: Int,
      testBp: Int,
      salt: String = "split"
  ): DataFrame = {
    val b = bucket(key, salt)
    df.withColumn(
      "split",
      when(b < valBp, "val")
        .when(b < valBp + testBp, "test")
        .otherwise("train"))
  }

  /** Integer upsampling: repeat each row `weight` times with a copy index
    * (epoch-mixing weights). `weight` ≤ 0 drops the row.
    */
  def upsample(df: DataFrame, weight: Column): DataFrame =
    df.withColumn("copy_idx",
      explode(when(weight >= 1, sequence(lit(1), weight))
        .otherwise(array().cast("array<int>"))))
}
