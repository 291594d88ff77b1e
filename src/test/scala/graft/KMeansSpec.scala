package graft

import org.apache.spark.sql.functions._

import graft.similarity.{CosineTopK, KMeans}

class KMeansSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("Lloyd iterations converge to the obvious 2-cluster split") {
    // two tight groups around (10, 0) and (0, 10); seeds are ids 0 and 1
    // (one from each group) so a single iteration already separates them
    val df = Seq(
      (0L, vec(10f, 0f)), (2L, vec(11f, 0f)), (4L, vec(10f, 1f)),
      (1L, vec(0f, 10f)), (3L, vec(0f, 11f)), (5L, vec(1f, 10f))
    ).toDF("vec_id", "embedding")
    val out = KMeans.kmeans(df, "vec_id", "embedding", k = 2, iters = 2)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    out(0L) shouldBe 0L; out(2L) shouldBe 0L; out(4L) shouldBe 0L
    out(1L) shouldBe 1L; out(3L) shouldBe 1L; out(5L) shouldBe 1L
  }

  test("centroid update is the exact component-wise floor mean, signed") {
    // one cluster, components with a NEGATIVE sum not divisible by count:
    // sum_x = q(1.0) + q(-2.0) + q(-2.0) = -300000 → mean -100000 (exact);
    // sum_y = q(0.1) + q(0.1) + q(0.0) = 20000 → floor(20000/3) = 6666
    val df = Seq(
      (0L, vec(1f, 0.1f)), (1L, vec(-2f, 0.1f)), (2L, vec(-2f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = KMeans.train(df, "vec_id", "embedding", k = 1, iters = 1)
    cents should have size 1
    cents.head.qv shouldBe Array(-100000L, 6666L)
    // and a sum that floors BELOW the truncation result: sum -20000 over 3
    // → floor = -6667 (truncation would give -6666)
    val df2 = Seq(
      (0L, vec(-0.1f, 0f)), (1L, vec(-0.1f, 0f)), (2L, vec(0f, 0f))
    ).toDF("vec_id", "embedding")
    KMeans.train(df2, "vec_id", "embedding", k = 1, iters = 1)
      .head.qv shouldBe Array(-6667L, 0L)
  }

  test("a centroid that loses every member drops out deterministically") {
    // seeds are ids 0 and 1, but EVERY point (including seed 1's own
    // vector, which ties to both and breaks to the lower cent_id after the
    // first update pulls centroid 0 onto the mass) collapses onto cluster 0
    val df = Seq(
      (0L, vec(5f, 5f)), (1L, vec(5f, 5f)), (2L, vec(5f, 5f)), (3L, vec(5f, 5f))
    ).toDF("vec_id", "embedding")
    val cents = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 2)
    cents.map(_.centId) shouldBe Seq(0L)
    val out = KMeans.assign(df, "vec_id", "embedding", cents)
      .select("cluster_id").distinct().as[Long].collect()
    out shouldBe Array(0L)
  }

  test("assignment is shuffle-free (no Exchange below the projection)") {
    val df = Seq((0L, vec(1f, 0f)), (1L, vec(0f, 1f)), (2L, vec(1f, 1f)))
      .toDF("vec_id", "embedding").repartition(3)
    val cents  = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 1)
    val plan   = KMeans.assign(df, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    // the input repartition is the frame's own; assignment itself must add
    // no exchange (centroids ride as literals, not a join)
    plan.split("Exchange").length - 1 shouldBe 1
  }

  test("ivfTrained hits brute-force recall >= 0.6 on clustered data and is a subset of the corpus") {
    // 4 clusters of 25 around orthogonal-ish axes, 8 queries
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f)
    val bases = Seq(vec(10f, 0f, 0f, 0f), vec(0f, 10f, 0f, 0f),
      vec(0f, 0f, 10f, 0f), vec(0f, 0f, 0f, 10f))
    val corpus = (0 until 100).map(i => (i.toLong + 100L, jitter(bases(i % 4))))
      .toDF("vec_id", "embedding")
    val queries = (0 until 8).map(i => (i.toLong, jitter(bases(i % 4))))
      .toDF("vec_id", "embedding")

    val exact = CosineTopK.bruteForce(queries, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = KMeans.ivfTrained(queries, corpus, "vec_id", "embedding",
      k = 5, kClusters = 4, iters = 2, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    approx.map(_._2).subsetOf((100L until 200L).toSet) shouldBe true
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.6
  }
}
