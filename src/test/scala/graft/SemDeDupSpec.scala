package graft

import graft.similarity.SemDeDup

/** SemDeDup: keep/drop contract (lowest-id survivor, threshold-gated,
  * zero-norm exempt) and determinism across partitionings.
  */
class SemDeDupSpec extends SparkSpecBase {
  import spark.implicits._

  // seeds (smallest ids) span the two regions so k=2 training separates
  // them; ids 3,4 sit near seed 1, id 5 near seed 2, id 6 is the zero
  // vector (no cosine — always kept)
  private val rows = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0f, 0f, 1f, 0f)),
    (3L, Seq(0.99f, 0.01f, 0f, 0f)), // cos vs 1 ≈ 0.99995 → dropped
    (4L, Seq(0.6f, 0.8f, 0f, 0f)),   // cos vs 1 = 0.6 < 0.95 → kept
    (5L, Seq(0f, 0f, 0.98f, -0.01f)),// cos vs 2 ≈ 0.99995 → dropped
    (6L, Seq(0f, 0f, 0f, 0f))        // zero norm → kept
  )

  private def run(df: org.apache.spark.sql.DataFrame) =
    SemDeDup.semanticDedup(df, "vec_id", "embedding",
      kClusters = 2, iters = 1, minCosine = 0.95)

  test("drops exactly the higher-id in-cluster near-duplicates") {
    val out = run(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
    out.filter(_._2._2).keySet shouldBe Set(1L, 2L, 4L, 6L)
    // cluster co-membership: the near-dup pairs share a cluster
    out(3L)._1 shouldBe out(1L)._1
    out(5L)._1 shouldBe out(2L)._1
    out(4L)._1 shouldBe out(1L)._1
  }

  test("deterministic across partitionings") {
    val base = run(rows.toDF("vec_id", "embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val rep = run(rows.toDF("vec_id", "embedding").repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    rep shouldBe base
  }

  test("threshold gates the relation: tau above the pair cosine keeps everything") {
    val out = SemDeDup.semanticDedup(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", kClusters = 2, iters = 1, minCosine = 0.99999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    out.values.forall(identity) shouldBe true
  }
}
