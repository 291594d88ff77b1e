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

  /** Physical strategy for the wedge+closure step. */
  sealed trait Path
  object Path {
    /** Sorted-adjacency intersection — the PRODUCTION path. Out-neighbor
      * lists are collected per source (degree ordering bounds each list by
      * O(√m)), and each oriented edge (a, b) intersects N⁺(a) with N⁺(b):
      * every triangle lives on exactly one such edge (its (d,id)-minimum
      * vertex a, with the b→c closing edge oriented by the same total
      * order). CPU is Σ_e (d⁺(u)+d⁺(v)) ≤ O(m^1.5) and NO wedge row is
      * ever materialized — the wedge join's Σ d⁺² blow-up (10⁸ rows on
      * the sf0.1 co-purchase graph) is the round-7 scale-killer this
      * path retires.
      */
    case object Adjacency extends Path
    /** Wedge equi-join + closure semi-join — the relational twin the
      * DuckDB oracle replays; materializes every wedge. Kept as the audit
      * reference; use [[Adjacency]] everywhere else.
      */
    case object WedgeJoin extends Path
  }

  /** All triangles, one row each: (a, b, c) with a the orientation
    * source and b < c by id.
    */
  def triangles(edges: DataFrame, src: String = "src", dst: String = "dst",
      path: Path = Path.Adjacency): DataFrame = {
    val ori = orient(normalize(edges, src, dst))
    path match {
      case Path.Adjacency =>
        // N⁺ as a sorted array per source; max out-degree under degree
        // ordering is O(√m), so a single list stays task-sized even at
        // 100-TB edge counts (m = 10¹² → ≤ ~10⁶ entries).
        val adj = ori.groupBy(col("s"))
          .agg(sort_array(collect_list(col("t"))).as("nbrs"))
        ori
          .join(adj.select(col("s"), col("nbrs").as("s_nbrs")), Seq("s"))
          .join(adj.select(col("s").as("t"), col("nbrs").as("t_nbrs")),
            Seq("t")) // inner: a sink-only t closes no wedge
          .select(col("s").as("a"), col("t").as("x"),
            explode(array_intersect(col("s_nbrs"), col("t_nbrs"))).as("y"))
          .select(col("a"), least(col("x"), col("y")).as("b"),
            greatest(col("x"), col("y")).as("c"))
      case Path.WedgeJoin =>
        val e1 = ori.select(col("s").as("a"), col("t").as("b"))
        val e2 = ori.select(col("s").as("a2"), col("t").as("c"))
        val wedges = e1.join(e2, col("a") === col("a2") && col("b") < col("c"))
          .select("a", "b", "c")
        // the closing edge may be oriented either way — check the undirected set
        val und = ori.select(col("s").as("b"), col("t").as("c"))
          .unionAll(ori.select(col("t").as("b"), col("s").as("c")))
        // using-column join puts (b, c) first — restore the (a, b, c) contract
        wedges.join(und, Seq("b", "c"), "left_semi").select("a", "b", "c")
    }
  }

  /** Per-node triangle participation counts (nodes in ≥ 1 triangle). */
  def perNode(edges: DataFrame, src: String = "src", dst: String = "dst",
      path: Path = Path.Adjacency): DataFrame = {
    val t = triangles(edges, src, dst, path)
    t.select(col("a").as("node"))
      .unionAll(t.select(col("b").as("node")))
      .unionAll(t.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }
}
