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
    * salt to draw an independent sample). A NULL key hashes via a sentinel
    * so every operator here treats null-key rows identically (they sample
    * at the normal rate and land in a deterministic split) — without it,
    * `filter(null < r)` silently DROPS null keys from sample() while
    * split()'s when-chain falls through to "train": a silent train-set
    * bias.
    */
  def bucket(key: Column, salt: String): Column =
    hexHash48(concat(coalesce(key.cast("string"), lit("\u0000null_key")), lit(salt))) % Buckets

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

  /** Weighted (importance) sampling: keep each row with probability
    * `rateBp/10000 × weightBp/10000`, deterministically by key — e.g.
    * sample documents proportional to a quality score so high-quality data
    * is over-represented without duplicating rows.
    *
    * `weightBp` is a per-row weight in basis points (0..10000 ⇒ 0..1×),
    * clamped to that range. The decision is pure INTEGER arithmetic
    * (`bucket × 10000 < weightBp × rateBp`), so it is bit-identical across
    * engines — no float thresholds. Narrow op: filter only, no shuffle,
    * scales linearly.
    */
  def weightedSample(
      df: DataFrame,
      key: Column,
      weightBp: Column,
      rateBp: Int,
      salt: String = "w0"
  ): DataFrame = {
    val w = least(greatest(weightBp.cast("long"), lit(0L)), lit(Buckets))
    df.filter(bucket(key, salt) * Buckets < w * rateBp)
  }

  /** Per-group quota cap: keep at most `cap` rows per group, chosen
    * deterministically by hash priority — the "max N documents per domain"
    * curation rule that stops a handful of giant crawl domains from
    * dominating the mixture.
    *
    * Semantics: exactly `min(cap, |group|)` survivors per group — the rows
    * ranked first by `(bucket(key), key)` within the group (equivalent to
    * `row_number() OVER (PARTITION BY group ORDER BY bucket, key) <= cap`).
    *
    * Scale shape — a naive per-group `row_number` sorts ENTIRE groups, and
    * at 100 TB a hot domain is billions of rows on one reducer. Instead:
    *   1. count rows per group (map-side-combined agg, one small result);
    *   2. groups within quota pass through unsorted — zero sort work;
    *   3. over-quota groups are pre-pruned by a hash-priority threshold
    *      (`bucket < margin × cap/|group| × 10000`) BEFORE the window, so
    *      the sort sees ~margin×cap rows per group instead of |group|;
    *   4. exactness check: a pre-pruned group retaining ≥ cap survivors
    *      proves the prune kept a superset of the true top-`cap` (any row
    *      above the bucket threshold ranks after every kept row). Groups
    *      that fail the check (pathological hash clustering) fall back to
    *      the full window, so the result is ALWAYS exact.
    *
    * The group-count join is broadcast (group cardinality ≪ row count).
    */
  def quotaCap(
      df: DataFrame,
      group: Seq[String],
      key: Column,
      cap: Int,
      salt: String = "q0",
      margin: Int = 4
  ): DataFrame = {
    require(cap > 0, "quotaCap: cap must be positive")
    capPerGroup(df, group, key,
      counts => counts.select(group.map(col) :+ lit(cap.toLong).as("__cap"): _*),
      salt, margin)
  }

  /** Rebalance a corpus to a target source mixture WITHOUT upsampling: keep
    * exactly the largest total the target shares allow given the per-source
    * supply, choosing survivors deterministically by hash priority — the
    * "60% web / 30% code / 10% books" rebalancing step of a training-data
    * pipeline, exact and reproducible (no multinomial `rand()`).
    *
    * Math (all integer, engine-portable): with S = Σ shares and n_k rows of
    * source k, the achievable total is T = min_k ⌊n_k·S / share_k⌋ (the
    * scarcest source binds the mixture), and source k keeps
    * cap_k = ⌊T·share_k / S⌋ rows. Sources not named in `sharesBp` are
    * dropped; every named source must be present (loud require — a missing
    * source silently zeroing the mixture would be a data bug).
    *
    * Scale shape: per-source counts are a map-side-combined agg collected
    * to the driver — ONE row per configured source (bounded by the mixture
    * spec, not the data), the same class of tiny-aggregate materialization
    * as a broadcast. Row selection runs through the shared hash-priority
    * prune (`quotaCap` machinery), so hot sources never sort whole groups.
    */
  def mixToShares(
      df: DataFrame,
      sourceCol: String,
      sharesBp: Map[String, Int],
      key: Column,
      salt: String = "m0",
      margin: Int = 4
  ): DataFrame = {
    require(sharesBp.nonEmpty, "mixToShares: empty shares")
    require(sharesBp.values.forall(_ > 0), "mixToShares: shares must be positive")
    val s = sharesBp.values.map(_.toLong).sum
    // group on a canonical STRING copy of the source column: sharesBp keys
    // are strings, and grouping/joining on the original column would make
    // the count collection throw (getAs[String]) — or worse, silently
    // coerce — when the source column is numeric
    val srcStr = "__mix_src"
    val base   = df.withColumn(srcStr, col(sourceCol).cast("string"))
    val scoped = base.filter(col(srcStr).isin(sharesBp.keys.toSeq: _*))
    capPerGroup(scoped, Seq(srcStr), key, counts => {
      val n = counts.collect()
        .map(r => r.getAs[String](0) -> r.getAs[Long](1)).toMap
      sharesBp.keys.foreach(k => require(n.contains(k),
        s"mixToShares: source '$k' has no rows — mixture unreachable"))
      val t = sharesBp.map { case (k, shr) => n(k) * s / shr }.min
      val caps = sharesBp.toSeq.map { case (k, shr) => (k, t * shr / s) }
      import scoped.sparkSession.implicits._
      caps.toDF(srcStr, "__cap")
    }, salt, margin).drop(srcStr)
  }

  /** Shared engine for per-group survivor caps. `capsOf` maps the group
    * counts frame to (group cols…, `__cap` long); groups WITHOUT a caps row
    * are dropped entirely. Semantics per group: exactly min(cap, |group|)
    * survivors — the rows ranked first by (bucket(key), key).
    *
    * Scale shape — a naive per-group `row_number` sorts ENTIRE groups, and
    * at 100 TB a hot group is billions of rows on one reducer. Instead:
    *   1. count rows per group (map-side-combined agg, one small result);
    *   2. groups within quota pass through unsorted — zero sort work;
    *   3. over-quota groups are pre-pruned by a hash-priority threshold
    *      (`bucket < margin × cap/|group| × 10000`) BEFORE the window, so
    *      the sort sees ~margin×cap rows per group instead of |group|;
    *   4. exactness check: a pre-pruned group retaining ≥ cap survivors
    *      proves the prune kept a superset of the true top-`cap` (any row
    *      above the bucket threshold ranks after every kept row). Groups
    *      that fail the check (pathological hash clustering) fall back to
    *      the full window, so the result is ALWAYS exact.
    *
    * The group-count join is broadcast (group cardinality ≪ row count).
    */
  private def capPerGroup(
      df: DataFrame,
      group: Seq[String],
      key: Column,
      capsOf: DataFrame => DataFrame,
      salt: String,
      margin: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = group.map(col)

    // Every internal join on the group key is NULL-SAFE (<=>): a NULL group
    // value is a legitimate group to groupBy/Window, so a null-unsafe join
    // would silently drop those rows — the exact bug class bucket()'s
    // sentinel guards against for key columns.
    def semiOn(big: DataFrame, small: DataFrame, anti: Boolean = false): DataFrame = {
      val l  = big.alias("__qc_l")
      val r  = small.alias("__qc_r")
      val eq = group.map(k => col(s"__qc_l.$k") <=> col(s"__qc_r.$k")).reduce(_ && _)
      l.join(broadcast(r), eq, if (anti) "left_anti" else "left_semi")
    }

    val counts = df.groupBy(gcols: _*).agg(count(lit(1)).as("__grp_n"))
    val caps   = capsOf(counts)
    // counts ⋈ caps (inner: capless groups are dropped by contract)
    val ccN = counts.alias("__qc_n")
    val ccP = caps.alias("__qc_p")
    val eqNP = group.map(k => col(s"__qc_n.$k") <=> col(s"__qc_p.$k")).reduce(_ && _)
    val cc = ccN.join(ccP, eqNP)
      .select(group.map(k => col(s"__qc_n.$k")) :+ col("__grp_n") :+ col("__cap"): _*)

    val d    = df.alias("__qc_d")
    val c    = broadcast(cc.alias("__qc_c"))
    val eqDC = group.map(k => col(s"__qc_d.$k") <=> col(s"__qc_c.$k")).reduce(_ && _)
    val withN = d.join(c, eqDC)
      .select(df.columns.toSeq.map(n => col(s"__qc_d.$n")) :+
        col("__grp_n") :+ col("__cap"): _*)
    val under = withN.filter(col("__grp_n") <= col("__cap"))
      .drop("__grp_n", "__cap")

    val over = withN.filter(col("__grp_n") > col("__cap"))
    val prio = bucket(key, salt)
    // threshold in bucket units; +1 guards tiny caps rounding to zero
    val thr    = lit(margin.toLong * Buckets) * col("__cap") / col("__grp_n") + 1
    val pruned = over.filter(prio < thr).drop("__grp_n")
    val kept = pruned.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__kept_n"), first(col("__cap")).as("__kcap"))
    val okGroups = kept.filter(col("__kept_n") >= col("__kcap")).select(gcols: _*)
    // fallback set derived from COUNTS, not from `kept`: a group whose
    // prune retained zero rows is absent from `kept` entirely and must
    // still fall back, or it would be dropped wholesale
    val badGroups = semiOn(
      cc.filter(col("__grp_n") > col("__cap")).select(gcols: _*), okGroups,
      anti = true)
    val w = Window.partitionBy(gcols: _*).orderBy(prio, key)
    val prunedTop = semiOn(pruned, okGroups)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__cap"))
    // exactness fallback: re-window the FULL group where the prune kept
    // fewer than `cap` rows (possible only under adversarial hash
    // clustering)
    val fallbackTop = semiOn(over.drop("__grp_n"), badGroups)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__cap"))
    under.unionByName(
      prunedTop.drop("__rn", "__cap").unionByName(fallbackTop.drop("__rn", "__cap")))
      .select(df.columns.toSeq.map(col): _*)
  }
}
