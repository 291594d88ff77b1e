package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication: cluster the embedding space with the exact
  * quantized Lloyd from [[KMeans]], then deduplicate WITHIN each cluster —
  * two vectors are semantic duplicates when their embedding cosine reaches
  * `minCosine`; the lowest-id member of each duplicate relation survives
  * (SemDeDup — Abbas, Tirumala, Rimanić, Smith, Morcos, arXiv:2303.09540,
  * public literature; reference analogue: the silver-layer dedup stage
  * contract in `requirements/meta/meta_module_06_requirements.md:68`,
  * generalized from natural-key to semantic identity).
  *
  * Drop contract (deterministic, oracle-replayable, NO transitive
  * closure): x is dropped iff some y with y.id < x.id lies in the SAME
  * cluster and cos(x, y) >= minCosine. Zero-norm vectors have no cosine —
  * they are always kept and never drop others (they still receive a
  * cluster from the Euclidean assignment).
  *
  * Scale shape — the reason SemDeDup beats flat near-dup LSH for
  * embedding spaces at 100 TB: training cost is `iters` Lloyd rounds
  * (shuffle-free assignment, one wide agg per round); the pairwise cosine
  * step is an equi-join on cluster_id, so the quadratic blow-up is
  * bounded per cluster (pick kClusters ≈ N/5k to keep clusters small);
  * the duplicate set never leaves the executors until the final
  * distinct(). Cosine is the engine-standard deterministic form (exact
  * integer dot and norms, one double division).
  */
object SemDeDup {

  /** Returns every input row tagged: (idCol, cluster_id, kept). */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      kClusters: Int,
      iters: Int,
      minCosine: Double
  ): DataFrame = {
    val cents    = KMeans.train(df, idCol, vecCol, kClusters, iters)
    val assigned = KMeans.assign(df, idCol, vecCol, cents)
      .select(col(idCol), col("cluster_id"))
    val prepped = CosineTopK.prepare(
      df.select(col(idCol).cast("long").as(idCol), col(vecCol)), vecCol)
      .join(assigned, idCol)
      .select(col(idCol), col("cluster_id"), col("qv"), col("norm2"))

    val a = prepped.select(col(idCol).as("id_a"), col("cluster_id"),
      col("qv").as("qa"), col("norm2").as("na"))
    val b = prepped.select(col(idCol).as("id_b"), col("cluster_id"),
      col("qv").as("qb"), col("norm2").as("nb"))
    val dropped = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b") && col("na") > 0 && col("nb") > 0)
      .filter(CosineTopK.cosine(
        CosineTopK.dotQ(col("qa"), col("qb")), col("na"), col("nb")) >= minCosine)
      .select(col("id_b").as(idCol))
      .distinct()
      .withColumn("__sd_dropped", lit(true))

    assigned
      .join(dropped, Seq(idCol), "left_outer")
      .select(col(idCol), col("cluster_id"),
        coalesce(col("__sd_dropped"), lit(false)).unary_!.as("kept"))
  }
}
