package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer PageRank — link-graph centrality as a fixed number of
  * joins-and-aggregations, the canonical "iterative algorithm as dataflow"
  * shape (alongside [[ConnectedComponents]]' label propagation and
  * `similarity.KMeans`' Lloyd rounds). A training-data pipeline uses it to
  * weight documents by citation/link centrality before sampling.
  *
  * Arithmetic contract ("floor PageRank"): ranks are integers at a fixed
  * `scale`; a node with out-degree `d` sends `rank DIV d` to each successor
  * (the `mod d` remainder is dropped, deterministically); the update is
  *   `r' = ((1e6 - dampingPpm)·base + dampingPpm·inSum) DIV 1e6`
  * with `base = scale DIV nNodes`. Dangling-node mass is dropped, not
  * redistributed — a documented deviation from the stochastic-matrix
  * formulation that buys bit-exact, engine-portable results (the gated
  * query replays both iterations in DuckDB CTEs). Overflow-safe by
  * construction: `inSum <= scale` (total mass never grows), so
  * `dampingPpm·inSum <= 1e6·scale = 1e18 < 2^63`.
  *
  * Scale shape: per iteration, one hash join of the edge list with the
  * current rank vector on `src` (both sides partitioned by the same key —
  * AQE keeps the exchange reused), one join with the out-degree table, and
  * one map-side-combined sum keyed on `dst`. Lineage is cut per iteration
  * with an eager `localCheckpoint` (the previous iteration's checkpoint is
  * unpersisted once the next materializes — no monotone block-manager
  * growth across deep runs); nothing touches the driver but the node
  * count.
  */
object PageRank {

  /** `edges`: (`src`, `dst`) integral ids, multi-edges allowed (each
    * parallel edge carries its own contribution — pre-`distinct` upstream
    * if that isn't wanted). Output: (`id`, `r`) over every node appearing
    * as source or destination.
    */
  def ranks(
      edges: DataFrame,
      iterations: Int,
      dampingPpm: Long = 850000L,
      scale: Long = 1000000000000L
  ): DataFrame = {
    require(iterations >= 1, s"PageRank: iterations must be >= 1, got $iterations")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"PageRank: dampingPpm must be in [0, 1e6], got $dampingPpm")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val outd = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    val n = nodes.count()
    val base = scale / n
    var rank = nodes.withColumn("r", lit(base))
    var prev: DataFrame = null
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(rank.withColumnRenamed("id", "src"), "src")
        .join(outd, "src")
        .select(col("dst").as("id"), expr("r DIV d").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          expr(s"((${1000000L - dampingPpm} * ${base}L) + " +
            s"$dampingPpm * coalesce(s, 0L)) DIV 1000000").as("r"))
        .localCheckpoint()
      if (prev != null) prev.unpersist()
      prev = rank
      rank = next
    }
    if (prev != null && (prev ne rank)) prev.unpersist()
    e.unpersist(); nodes.unpersist(); outd.unpersist()
    rank
  }
}
