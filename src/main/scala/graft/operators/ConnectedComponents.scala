package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components by iterative min-label propagation —
  * the clustering stage of a dedup pipeline (near-dup PAIRS → dedup
  * GROUPS with one canonical representative each).
  *
  * Algorithm: every vertex starts labeled with its own id; each round
  * every vertex takes the minimum label among itself and its neighbors.
  * The component minimum floods one hop per round, so the round count is
  * the graph diameter (plus one round to observe the fixpoint). Near-dup
  * graphs are quasi-cliques — a cluster of mutual near-duplicates has
  * diameter 1-3 — so the practical round count is small and independent
  * of corpus size. For adversarially long path graphs the O(log n)
  * alternating star algorithms (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") trade fewer rounds for per-node neighborhood
  * materialization (a skew hazard on high-degree nodes); min-label
  * propagation keeps every round a pure join + partial-aggregated min —
  * no per-node arrays, no skew cliff.
  *
  * Scale shape per round: one shuffle join (symmetric edges × labels on
  * src) + one map-side-combined `min` aggregation + one label join. The
  * driver loop only inspects a single aggregate per round (the label
  * SUM, exact in DECIMAL(38,0)); labels are monotonically nonincreasing,
  * so an unchanged sum IS the fixpoint — no row-level comparison, no
  * collect of data. `localCheckpoint` truncates the growing lineage each
  * round (iterative plans otherwise compound into exponential re-execution).
  *
  * Fails loudly (require) if `maxIter` rounds don't converge — a wrong
  * clustering must never be returned silently.
  */
object ConnectedComponents {

  /** Component label (= minimum member id) per vertex.
    *
    * @param edges    undirected edges, columns (src, dst), any orientation,
    *                 endpoints must appear in `vertices`
    * @param vertices one column `id` (numeric, cast to long), distinct
    * @return (id, component) — component is the min id reachable from id
    */
  def labels(edges: DataFrame, vertices: DataFrame, maxIter: Int = 100): DataFrame = {
    // Loud type guard: casting a string/uuid id to long yields nulls, which
    // would silently drop every edge and return garbage null-id clusters.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    Seq("id" -> vertices.schema("id"), "src" -> edges.schema("src"),
      "dst" -> edges.schema("dst")).foreach { case (name, field) =>
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(field.dataType),
        s"ConnectedComponents requires integral ids; column '$name' is " +
          s"${field.dataType.simpleString} — map ids to longs (e.g. hash) first")
    }
    val sym = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))
      .filter(col("src") =!= col("dst"))
      .persist()
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("lbl").cast(DecimalType(38, 0)))).first()
      if (d.isNullAt(0)) java.math.BigDecimal.ZERO else d.getDecimal(0)
    }
    var cur = vertices.select(col("id").cast("long"), col("id").cast("long").as("lbl"))
      .localCheckpoint()
    var prevSum = labelSum(cur)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(cur, sym("src") === cur("id"))
        .groupBy(sym("dst").as("nid"))
        .agg(min("lbl").as("nlbl"))
      val next = cur.join(nbrMin, cur("id") === nbrMin("nid"), "left_outer")
        .select(cur("id"), least(cur("lbl"), coalesce(col("nlbl"), cur("lbl"))).as("lbl"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0 // monotone ⇒ equal sum = fixpoint
      prevSum = s
      cur = next
      iter += 1
    }
    sym.unpersist()
    require(converged,
      s"connected components did not converge within $maxIter rounds " +
        "(graph diameter exceeds maxIter) — raise maxIter")
    cur.select(col("id"), col("lbl").as("component"))
  }
}
