package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected graph — the third member
  * of the graph family ([[ConnectedComponents]] = reachability,
  * [[PageRank]] = centrality, this = local clustering / cohesion), the
  * standard building block for community cohesion metrics and for
  * near-dup cluster densification checks.
  *
  * Algorithm: the classic degree-ordered orientation (node-iterator++).
  * Every undirected edge is directed from its (degree, id)-smaller
  * endpoint to the larger; the orientation is acyclic and each triangle
  * then has EXACTLY ONE vertex with out-edges to the other two, so
  * counting (wedge b<c at a source a) ⋈ (closing edge b–c) counts each
  * triangle exactly once.
  *
  * Scale shape: degrees are one map-side-combined shuffle; the wedge
  * join shuffles oriented edges on the source key, and degree ordering
  * bounds every out-neighborhood by O(√m) on skew-free graphs — the
  * hub-explosion a naive wedge join suffers lands on the LOW-degree
  * endpoint instead (the reason every distributed triangle counter
  * orients by degree). The closure check is an equi-join against the
  * undirected edge set. All arithmetic is exact integers; no hashing —
  * the whole pipeline carries a plain DuckDB oracle.
  */
object TriangleCount {

  /** Canonical undirected edge set: (u < v), distinct, self-loops and
    * NULL endpoints dropped.
    */
  def normalize(edges: DataFrame, src: String, dst: String): DataFrame =
    edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .distinct()

  /** Degree-ordered orientation of a normalized edge set: s → t with
    * (deg, id) strictly increasing.
    */
  private[operators] def orient(norm: DataFrame): DataFrame = {
    val deg = norm.select(col("u").as("x"))
      .unionAll(norm.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val du = deg.select(col("x").as("u"), col("d").as("du"))
    val dv = deg.select(col("x").as("v"), col("d").as("dv"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    norm.join(du, "u").join(dv, "v")
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("s"),
        when(uFirst, col("v")).otherwise(col("u")).as("t"))
  }

  /** All triangles, one row each: (a, b, c) with a the orientation
    * source and b < c by id.
    */
  def triangles(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val ori = orient(normalize(edges, src, dst))
    val e1 = ori.select(col("s").as("a"), col("t").as("b"))
    val e2 = ori.select(col("s").as("a2"), col("t").as("c"))
    val wedges = e1.join(e2, col("a") === col("a2") && col("b") < col("c"))
      .select("a", "b", "c")
    // the closing edge may be oriented either way — check the undirected set
    val und = ori.select(col("s").as("b"), col("t").as("c"))
      .unionAll(ori.select(col("t").as("b"), col("s").as("c")))
    wedges.join(und, Seq("b", "c"), "left_semi")
  }

  /** Per-node triangle participation counts (nodes in ≥ 1 triangle). */
  def perNode(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val t = triangles(edges, src, dst)
    t.select(col("a").as("node"))
      .unionAll(t.select(col("b").as("node")))
      .unionAll(t.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }
}
