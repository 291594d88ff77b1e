package graft

import org.apache.spark.sql.functions._

import graft.gold.SketchDistinct

class SketchDistinctSpec extends SparkSpecBase {
  import spark.implicits._

  // 3 groups with known distinct cardinalities (g0: 2000, g1: 500, g2: 1)
  private lazy val data = (
    (0 until 4000).map(i => ("g0", s"v${i % 2000}")) ++
    (0 until 1500).map(i => ("g1", s"w${i % 500}")) ++
    Seq(("g2", "only"))
  ).toDF("grp", "value").repartition(8)

  test("merged per-batch sketches estimate within HLL error of exact") {
    val exact = Map("g0" -> 2000L, "g1" -> 500L, "g2" -> 1L)
    // split into 3 arbitrary batches, build + merge incrementally
    val batches = Seq(
      data.filter(crc32(col("value")) % 3 === 0),
      data.filter(crc32(col("value")) % 3 === 1),
      data.filter(crc32(col("value")) % 3 === 2))
    val store = batches.tail.foldLeft(
        SketchDistinct.buildSketches(batches.head, Seq("grp"), "value")) {
      (st, b) => SketchDistinct.merge(st, SketchDistinct.buildSketches(b, Seq("grp"), "value"), Seq("grp"))
    }
    val est = SketchDistinct.estimates(store)
      .select("grp", "approx_distinct").as[(String, Long)].collect().toMap
    est.keySet shouldBe exact.keySet
    exact.foreach { case (g, n) =>
      math.abs(est(g) - n).toDouble / n should be <= 0.05 // lgK=12 → ~1.6% RSE
    }
    // store stays one row per group
    store.count() shouldBe 3L
  }

  test("merge is replay-idempotent: re-merging a batch changes nothing") {
    // NOTE: compare post-union to post-union. A never-unioned sketch
    // serves the (order-dependent) HIP estimator; a union result serves
    // the composite estimator — identical registers, estimate can differ
    // by ±1, so store maintenance must live entirely in union-land.
    val b1    = SketchDistinct.buildSketches(data, Seq("grp"), "value")
    val once  = SketchDistinct.merge(b1, b1, Seq("grp"))
    val twice = SketchDistinct.merge(once, b1, Seq("grp"))
    SketchDistinct.estimates(twice)
      .select("grp", "approx_distinct").as[(String, Long)].collect().toMap shouldBe
      SketchDistinct.estimates(once)
        .select("grp", "approx_distinct").as[(String, Long)].collect().toMap
  }

  test("groups unseen by one side pass through the merge") {
    val a = SketchDistinct.buildSketches(
      Seq(("x", "1"), ("x", "2")).toDF("grp", "value"), Seq("grp"), "value")
    val b = SketchDistinct.buildSketches(
      Seq(("y", "9")).toDF("grp", "value"), Seq("grp"), "value")
    val est = SketchDistinct.estimates(SketchDistinct.merge(a, b, Seq("grp")))
      .select("grp", "approx_distinct").as[(String, Long)].collect().toMap
    est shouldBe Map("x" -> 2L, "y" -> 1L)
  }
}
