package graft

import graft.operators.TriangleCount
import org.apache.spark.sql.DataFrame

import scala.util.Random

/** TriangleCount: known-answer graphs, invariance to edge direction /
  * duplication / self-loops, and a randomized brute-force comparison.
  */
class TriangleCountSpec extends SparkSpecBase {
  import spark.implicits._

  private def edgesOf(es: Seq[(Long, Long)]): DataFrame = es.toDF("src", "dst")

  /** Count via the production Adjacency path, asserting the WedgeJoin
    * twin returns the IDENTICAL (a,b,c) row set — every test doubles as a
    * path-equivalence proof.
    */
  private def triCount(df: DataFrame): Long = {
    val adj = TriangleCount.triangles(df, path = TriangleCount.Path.Adjacency)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wj = TriangleCount.triangles(df, path = TriangleCount.Path.WedgeJoin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    adj shouldBe wj
    adj.size.toLong
  }

  test("known answers: K4 has 4 triangles, C4 has none, K4 per-node = 3 each") {
    val k4 = edgesOf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    triCount(k4) shouldBe 4L
    val perNode = TriangleCount.perNode(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perNode shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    val c4 = edgesOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    triCount(c4) shouldBe 0L
  }

  test("direction, duplicates, and self-loops do not change the count") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    triCount(edgesOf(tri)) shouldBe 1L
    triCount(edgesOf(tri.map { case (a, b) => (b, a) })) shouldBe 1L
    triCount(edgesOf(tri ++ tri ++ Seq((1L, 1L), (2L, 1L)))) shouldBe 1L
  }

  test("randomized graphs match the brute-force count") {
    val rnd = new Random(7)
    for (trial <- 0 until 5) {
      val n = 12 + rnd.nextInt(8)
      val es = (for {
        u <- 0L until n
        v <- (u + 1) until n
        if rnd.nextInt(100) < 30
      } yield (u, v)).toSeq
      val adj = es.toSet
      def conn(a: Long, b: Long) = adj.contains((a min b, a max b))
      val brute = (for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if conn(a, b) && conn(b, c) && conn(a, c)
      } yield 1).size.toLong
      withClue(s"trial $trial n=$n edges=${es.size}: ") {
        triCount(edgesOf(es)) shouldBe brute
      }
    }
  }
}
