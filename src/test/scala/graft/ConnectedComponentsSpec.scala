package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.dedup.NearDup
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  /** In-memory union-find ground truth. */
  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var r = v
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(v => v -> find(v)).toMap
  }

  private def ccLabels(vs: Seq[Long], es: Seq[(Long, Long)],
      maxIter: Int = 100): Map[Long, Long] =
    ConnectedComponents.labels(
      es.toDF("src", "dst"), vs.toDF("id"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("known graph: two components, an isolated vertex, min-id labels") {
    val got = ccLabels(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L)
  }

  test("path graph converges in diameter rounds (20-chain)") {
    val vs = (0L to 20L)
    val got = ccLabels(vs, vs.init.map(v => (v, v + 1)))
    got.values.toSet shouldBe Set(0L)
  }

  test("duplicate and reversed edges change nothing") {
    val got = ccLabels(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L)))
    got.values.toSet shouldBe Set(1L)
  }

  test("property: random graphs match union-find") {
    val rnd = new Random(42)
    (1 to 3).foreach { trial =>
      val n = 60
      val vs = (0 until n).map(_.toLong)
      val es = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      withClue(s"trial $trial: ") {
        ccLabels(vs, es) shouldBe unionFind(vs, es)
      }
    }
  }

  test("string ids are rejected loudly (silent cast-to-null would drop every edge)") {
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.labels(
        Seq(("a", "b")).toDF("src", "dst"), Seq("a", "b").toDF("id"))
    }
    ex.getMessage should include("integral ids")
  }

  test("non-convergence within maxIter fails loudly") {
    val vs = (0L to 30L)
    an[IllegalArgumentException] should be thrownBy
      ccLabels(vs, vs.init.map(v => (v, v + 1)), maxIter = 3)
  }

  test("dedupClusters: transitive near-dups share a cluster, canonical = min id") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today and tomorrow"
    val docs = Seq(
      // chain: 1 ~ 2 ~ 3 (1 vs 3 may or may not pair directly — the
      // cluster must hold regardless, via transitivity)
      (1L, base),
      (2L, base + " x"),
      (3L, base + " x y"),
      // exact dup pair in a separate cluster
      (10L, "completely different content about spark distributed query processing"),
      (11L, "completely different content about spark distributed query processing"),
      // singletons
      (20L, "unrelated noise alpha beta gamma delta epsilon zeta"),
      (21L, "short text")
    ).toDF("doc_id", "text")
    // both pair sources (exact AllPairs, banded-LSH default) must agree on
    // this corpus: the near-dups are close enough that LSH recall is total
    for (src <- Seq(NearDup.PairSource.Exact, NearDup.PairSource.MinHashLsh())) {
      val out = NearDup.dedupClusters(docs, "doc_id", "text", minJaccard = 0.8,
        pairSource = src)
        .as[(Long, Long, Int, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      withClue(s"pairSource=$src: ") {
        out(1L) shouldBe ((1L, 3, true))
        out(2L) shouldBe ((1L, 3, false))
        out(3L) shouldBe ((1L, 3, false))
        out(10L) shouldBe ((10L, 2, true))
        out(11L) shouldBe ((10L, 2, false))
        out(20L) shouldBe ((20L, 1, true))
        out(21L) shouldBe ((21L, 1, true))
        // the deduplicated corpus is exactly the canonical rows
        out.count(_._2._3) shouldBe 4
      }
    }
  }
}
