package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantized-integer Lloyd's k-means over embedding columns — the trained
  * coarse quantizer the IVF index wants (CosineTopK.ivf's `centroidPred`
  * id-subset is a stand-in; real centroids cut per-probe candidate counts
  * for the same recall).
  *
  * EXACT arithmetic end-to-end so training is deterministic and
  * cross-engine replayable (oracle-stability rules):
  *  - vectors quantized to a 1/`CosineTopK.Scale` integer grid;
  *  - squared Euclidean distance `n2(v) + n2(c) - 2·dot(v,c)` as exact
  *    BIGINT sums (the native `long_dot` kernel);
  *  - argmin with an explicit (dist2, cent_id) tiebreak;
  *  - centroid update = component-wise FLOOR mean, computed as
  *    `(s - pmod(s, cnt)) div cnt` — `(s - pmod)` is exactly divisible, so
  *    the quotient is identical whether an engine's integer division
  *    truncates or floors (signed sums!).
  *
  * Scale shape (the MLlib Lloyd layout, declarative):
  *  - assignment is a SHUFFLE-FREE projection: `least()` over k
  *    (dist2, cent_id) structs with centroid vectors baked in as literals —
  *    whole-stage-codegen'd k·dim multiply-adds per row, the same cost
  *    class as scoring any coarse quantizer;
  *  - the update is ONE map-side-combined aggregation of k rows × dim
  *    `sum(qv[j])` columns — no per-component row explosion, shuffle
  *    volume k·dim·partitions scalars;
  *  - per-iteration driver traffic is the k·dim centroid table (a few KB)
  *    — bounded, like every production k-means.
  *
  * k is a coarse-quantizer k (≲ a few thousand): assignment codegen width
  * and the literal footprint grow with k·dim.
  *
  * Clusters that lose all members simply drop out of later iterations
  * (standard Lloyd degeneracy; deterministic, and the DuckDB oracle's
  * group-by reproduces exactly the same drop).
  *
  * Init is the k smallest-id vectors: deterministic and replayable. For
  * quality-sensitive uses pass a spread `initPred` (e.g. a hash-stratified
  * subset) — convergence speed changes, exactness does not.
  */
object KMeans {

  /** A trained centroid: stable cluster id (its seed row's id), quantized
    * vector, exact square norm.
    */
  final case class QCentroid(centId: Long, qv: Array[Long], n2: Long)

  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("__km_id"),
      CosineTopK.quantize(col(vecCol)).as("__km_qv"))
      .withColumn("__km_n2", CosineTopK.dotQ(col("__km_qv"), col("__km_qv")))

  /** (dist2, cent_id) argmin over the centroid set, as a single `least()`
    * projection — struct ordering gives the explicit tiebreak.
    */
  private def bestOf(cents: Seq[QCentroid]): Column = {
    require(cents.nonEmpty, "kmeans: empty centroid set")
    val cands = cents.map { c =>
      struct(
        (lit(c.n2) + col("__km_n2")
          - lit(2L) * CosineTopK.dotQ(col("__km_qv"), typedLit(c.qv))).as("dist2"),
        lit(c.centId).as("cent_id"))
    }
    if (cands.size == 1) cands.head else least(cands: _*)
  }

  /** Lloyd iterations from the k smallest-id seeds; returns the trained
    * centroid table (id-stable, possibly < k after degeneracy drops).
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int
  ): Seq[QCentroid] = {
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(iters >= 0, s"kmeans: iters must be >= 0, got $iters")
    val p = prep(df, idCol, vecCol)
    var cents: Seq[QCentroid] = p
      .orderBy(col("__km_id"))
      .limit(k)
      .collect()
      .map(r => {
        val qv = r.getSeq[Long](1).toArray
        QCentroid(r.getLong(0), qv, r.getLong(2))
      })
      .toSeq
    require(cents.nonEmpty, "kmeans: input has no rows")
    val dim = cents.head.qv.length

    for (_ <- 0 until iters) {
      val assigned = p.withColumn("__km_cluster", bestOf(cents).getField("cent_id"))
      val sumCols = (0 until dim).map(j =>
        sum(element_at(col("__km_qv"), j + 1)).as(s"s_$j"))
      val rows = assigned
        .groupBy(col("__km_cluster"))
        .agg(count(lit(1)).as("cnt"), sumCols: _*)
        .collect()
      cents = rows.map { r =>
        val cid = r.getLong(0)
        val cnt = r.getLong(1)
        val qv = Array.tabulate(dim) { j =>
          val s = r.getLong(2 + j)
          // floor division via floorMod: exact for signed sums
          (s - java.lang.Math.floorMod(s, cnt)) / cnt
        }
        QCentroid(cid, qv, qv.map(x => x * x).sum)
      }.sortBy(_.centId).toSeq
    }
    cents
  }

  /** Assign every row to its nearest trained centroid.
    * Output: (idCol, cluster_id, dist2) — dist2 the exact quantized
    * squared Euclidean distance.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[QCentroid]
  ): DataFrame =
    prep(df, idCol, vecCol)
      .withColumn("__km_best", bestOf(cents))
      .select(
        col("__km_id").as(idCol),
        col("__km_best.cent_id").as("cluster_id"),
        col("__km_best.dist2").as("dist2"))

  /** train + assign in one call. */
  def kmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int
  ): DataFrame =
    assign(df, idCol, vecCol, train(df, idCol, vecCol, k, iters))

  /** IVF with TRAINED centroids: coarse-quantize the corpus by cluster,
    * probe the query's `nprobe` nearest clusters, search only those.
    * Same index structure as `CosineTopK.ivf`, with Lloyd centroids
    * (tighter clusters → fewer candidates per probe at equal recall).
    * Assignment and probing are Euclidean on the quantized grid (matches
    * training); final scoring is the engine-standard deterministic cosine.
    */
  def ivfTrained(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kClusters: Int,
      iters: Int,
      nprobe: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = train(corpus, idCol, vecCol, kClusters, iters)

    val assignedCorpus = prep(corpus, idCol, vecCol)
      .filter(col("__km_n2") > 0)
      .withColumn("cluster_id", bestOf(cents).getField("cent_id"))
      .select(col("__km_id").as("neighbor_id"), col("cluster_id"),
        col("__km_qv").as("c_qv"), col("__km_n2").as("c_n2"))

    // nprobe nearest clusters per query: argmin over the same literal
    // centroid table, ranked by exploding the per-row sorted candidate
    // array — still shuffle-free (no window over a cross join).
    val probeCands = cents.map { c =>
      struct(
        (lit(c.n2) + col("__km_n2")
          - lit(2L) * CosineTopK.dotQ(col("__km_qv"), typedLit(c.qv))).as("dist2"),
        lit(c.centId).as("cent_id"))
    }
    // two nodes on purpose: the dist2 dot products materialize in their own
    // codegen'd projection; array_sort (an HOF with an implicit comparator
    // lambda — CodegenFallback) and the explode live in the next node, so
    // the lambda's eviction can't take the LongVecDot kernels with it
    // (round-6 watchdog finding)
    val probes = prep(queries, idCol, vecCol)
      .filter(col("__km_n2") > 0)
      .withColumn("__km_cands", array(probeCands: _*))
      .withColumn("__km_probe",
        explode(slice(array_sort(col("__km_cands")), 1, nprobe)))
      .select(col("__km_id").as("query_id"), col("__km_qv").as("q_qv"),
        col("__km_n2").as("q_n2"), col("__km_probe.cent_id").as("cluster_id"))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    probes
      .join(assignedCorpus, "cluster_id")
      .withColumn("cosine",
        CosineTopK.cosine(CosineTopK.dotQ(col("q_qv"), col("c_qv")), col("q_n2"), col("c_n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
