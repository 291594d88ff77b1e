package graft

import graft.gold.HistogramStore
import graft.gold.HistogramStore.Edges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** HistogramStore: the mergeable/retractable fixed-edge histogram.
  *
  * The defining invariants, each proven on randomized data:
  *  1. merge of any batch split == one-shot build (bit-identical rows);
  *  2. a delete delta retracts exactly (store == build of survivors);
  *  3. quantileBounds BRACKETS the true lower-interpolation quantile
  *     (sorted-array element at floor((n-1)*q/1e6)) for every group and
  *     every q — the certainty-interval claim the gate query serves;
  *  4. under/overflow values land in the open-ended buckets with null
  *     open-side bounds;
  *  5. an over-delete raises.
  */
class HistogramStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private val edges = Edges(0L, 999L, 10) // width 100, nb = 10

  private def df(vs: Seq[(String, java.lang.Long)]): DataFrame =
    vs.toDF("g", "v")

  test("edges derive width and bucket count; bounds are closed integers") {
    edges.width shouldBe 100L
    edges.nb shouldBe 10L
    val e2 = Edges(0L, 20971519L, 256) // the gate query's edges
    e2.width shouldBe 81920L
    e2.nb shouldBe 256L
    // uneven span: 0..9 in 4 bins -> width 3, nb 4 (last bin truncated)
    val e3 = Edges(0L, 9L, 4)
    e3.width shouldBe 3L
    e3.nb shouldBe 4L
  }

  test("merge of a random split == one-shot build, and deletes retract") {
    val rnd = new Random(7)
    val rows = (0 until 2000).map { i =>
      (s"g${rnd.nextInt(3)}", java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
    }
    val all = df(rows)
    val b1 = all.filter(abs(hash(col("v"))) % 2 === 0)
    val b2 = all.filter(abs(hash(col("v"))) % 2 =!= 0)
    val merged = HistogramStore.merge(
      HistogramStore.build(b1, Seq("g"), "v", edges),
      HistogramStore.deltaOf(b2, Seq("g"), "v", edges, 1L))
    val oneShot = HistogramStore.build(all, Seq("g"), "v", edges)
    merged.collect().toSet shouldBe oneShot.collect().toSet

    // delete b2 again: back to exactly build(b1)
    val retracted = HistogramStore.merge(merged,
      HistogramStore.deltaOf(b2, Seq("g"), "v", edges, -1L))
    retracted.collect().toSet shouldBe
      HistogramStore.build(b1, Seq("g"), "v", edges).collect().toSet
  }

  test("quantileBounds brackets the true lower-interpolation quantile") {
    val rnd = new Random(13)
    val rows = (0 until 3000).map { i =>
      (s"g${rnd.nextInt(4)}", java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
    }
    val all = df(rows)
    val store = HistogramStore.build(all, Seq("g"), "v", edges)
    val qs = Seq(0L, 100000L, 250000L, 500000L, 900000L, 1000000L)
    val bounds = HistogramStore.quantileBounds(store, Seq("g"), qs, edges)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r)).toMap

    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2.longValue()).sorted)
    for ((g, sorted) <- byGroup; q <- qs) {
      val idx = ((sorted.length - 1).toLong * q) / 1000000L
      val truth = sorted(idx.toInt)
      val r = bounds((g, q))
      withClue(s"group $g q $q truth $truth row $r: ") {
        r.getLong(2) shouldBe sorted.length.toLong // n
        r.getLong(3) shouldBe idx                  // idx
        r.getLong(5) should be <= truth            // lo_bound
        r.getLong(6) should be >= truth            // hi_bound
        (r.getLong(6) - r.getLong(5)) should be < edges.width
      }
    }
  }

  test("out-of-range values take the open buckets with null open bounds") {
    val all = df(Seq(("a", -5L), ("a", 0L), ("a", 999L), ("a", 1000L),
      ("a", 2500L)).map { case (g, v) => (g, java.lang.Long.valueOf(v)) })
    val store = HistogramStore.build(all, Seq("g"), "v", edges)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    store(-1L) shouldBe 1L  // -5
    store(0L) shouldBe 1L   // 0
    store(9L) shouldBe 1L   // 999
    store(10L) shouldBe 2L  // 1000, 2500 share the overflow bucket
    // quantile over a group whose rank lands in an open bucket
    val b = HistogramStore.quantileBounds(
      HistogramStore.build(all, Seq("g"), "v", edges), Seq("g"),
      Seq(0L, 1000000L), edges).collect()
      .map(r => r.getLong(1) -> (Option(r.get(5)), Option(r.get(6)))).toMap
    b(0L)._1 shouldBe None          // q=0 -> underflow bucket, open lo
    b(1000000L)._2 shouldBe None    // q=1 -> overflow bucket, open hi
  }

  test("weighted quantiles == quantiles of the expanded multiset") {
    val rnd = new Random(29)
    val rows = (0 until 800).map { _ =>
      // weights 1..5: the zero-weight path is its own test below (a
      // zero-total bucket exists in the weighted store but not in the
      // expanded-multiset build, so this comparison keeps weights > 0)
      ("g" + rnd.nextInt(3), rnd.nextInt(1000).toLong, 1L + rnd.nextInt(5))
    }
    val all = rows.toDF("g", "v", "w")
    val store = HistogramStore.build(all, Seq("g"), "v", edges,
      weightCol = Some("w"))
    val qs = Seq(250000L, 500000L, 900000L)
    val bounds = HistogramStore.quantileBounds(store, Seq("g"), qs, edges)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r)).toMap
    val expanded = rows.groupBy(_._1).view.mapValues(
      _.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }.sorted)
    for ((g, sorted) <- expanded if sorted.nonEmpty; q <- qs) {
      val idx = ((sorted.length - 1).toLong * q) / 1000000L
      val truth = sorted(idx.toInt)
      val r = bounds((g, q))
      withClue(s"group $g q $q truth $truth: ") {
        r.getLong(2) shouldBe sorted.length.toLong
        r.getLong(5) should be <= truth
        r.getLong(6) should be >= truth
      }
    }
    // weighted build == unweighted build of the expanded multiset
    val expandedDf = rows.flatMap { case (g, v, w) =>
      Seq.fill(w.toInt)((g, java.lang.Long.valueOf(v))) }.toDF("g", "v")
    store.collect().toSet shouldBe
      HistogramStore.build(expandedDf, Seq("g"), "v", edges).collect().toSet
  }

  test("uneven-span overflow bucket still brackets the quantile") {
    // Edges(0,9,4): width 3, nb 4 — regular buckets cover 0..11, so the
    // overflow lo_bound must clamp to hi+1 = 10 (lo + nb*width = 12 would
    // exceed the smallest overflow value and break the bracketing claim)
    val e = Edges(0L, 9L, 4)
    val all = df(Seq(("a", 10L), ("a", 11L), ("a", 40L))
      .map { case (g, v) => (g, java.lang.Long.valueOf(v)) })
    val store = HistogramStore.build(all, Seq("g"), "v", e)
    store.collect().map(_.getLong(1)).toSet shouldBe Set(4L) // all overflow
    val r = HistogramStore.quantileBounds(store, Seq("g"), Seq(0L), e)
      .collect().head
    r.getLong(5) shouldBe 10L      // lo_bound = hi+1, brackets truth 10
    Option(r.get(6)) shouldBe None // open hi side
  }

  test("zero-total-weight cells vanish in build (batch-split identity)") {
    // a (group,bucket) cell whose weights sum to zero must not survive
    // build(), or merge-of-splits (which filters cnt=0) would differ from
    // the one-shot build in the zero-sum corner
    val all = Seq(("z", 5L, 1L), ("z", 7L, -1L), ("a", 5L, 2L))
      .toDF("g", "v", "w")
    val oneShot = HistogramStore.build(all, Seq("g"), "v", edges,
      weightCol = Some("w"))
    oneShot.collect().map(_.getString(0)).toSet shouldBe Set("a")
    val b1 = all.filter(col("w") > 0)
    val b2 = all.filter(col("w") <= 0)
    val merged = HistogramStore.merge(
      HistogramStore.build(b1, Seq("g"), "v", edges, weightCol = Some("w")),
      HistogramStore.deltaOf(b2, Seq("g"), "v", edges, 1L,
        weightCol = Some("w")))
    merged.collect().toSet shouldBe oneShot.collect().toSet
  }

  test("an all-zero-weight group serves no quantile rows") {
    val all = Seq(("z", 5L, 0L), ("z", 7L, 0L), ("a", 5L, 2L))
      .toDF("g", "v", "w")
    val store = HistogramStore.build(all, Seq("g"), "v", edges,
      weightCol = Some("w"))
    val out = HistogramStore.quantileBounds(store, Seq("g"),
      Seq(500000L), edges).collect()
    out.map(_.getString(0)).toSet shouldBe Set("a")
  }

  test("NULL values are not counted (percentile semantics)") {
    val all = df(Seq(("a", java.lang.Long.valueOf(5L)), ("a", null),
      ("a", java.lang.Long.valueOf(7L))))
    val store = HistogramStore.build(all, Seq("g"), "v", edges)
    store.agg(sum("cnt")).collect().head.getLong(0) shouldBe 2L
  }

  test("over-delete raises") {
    val base = df(Seq(("a", java.lang.Long.valueOf(5L))))
    val store = HistogramStore.build(base, Seq("g"), "v", edges)
    val doubleDelete = HistogramStore.merge(store,
      HistogramStore.deltaOf(base, Seq("g"), "v", edges, -2L))
    val e = intercept[Exception](doubleDelete.collect())
    e.getMessage should include("negative")
  }
}
