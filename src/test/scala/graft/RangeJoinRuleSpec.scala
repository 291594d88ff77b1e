package graft

import org.apache.spark.sql.functions._

/** RewriteRangeJoin (plans.GraftExtensions): a NAIVE range-predicate join —
  * which Spark plans as a BroadcastNestedLoopJoin — is auto-rewritten to
  * the bucketized equi-join when `spark.graft.rangeJoin.bucketWidth` is
  * set, with identical results and unchanged output schema.
  */
class RangeJoinRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def pts = (0 until 200).map(i => (i.toLong, (i * 7 % 500).toLong))
    .toDF("pid", "x")
  private def ivs = (0 until 50).map { i =>
    val lo = (i * 11 % 480).toLong
    (i.toLong, lo, lo + 25)
  }.toDF("iid", "lo", "hi")

  private def withWidth[A](w: String)(f: => A): A =
    try { spark.conf.set(WidthKey, w); f }
    finally spark.conf.unset(WidthKey)

  test("naive range join rewrites to an equi-join with identical results") {
    val q = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi")
    // control: without the conf the plan is the nested loop
    q.queryExecution.executedPlan.toString should
      include("BroadcastNestedLoopJoin")
    val expect = q.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    expect.length should be > 100
    withWidth("32") {
      val q2 = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi")
      val plan = q2.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
      q2.columns shouldBe q.columns
      q2.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq shouldBe expect
    }
  }

  test("strict bounds and reversed orientation keep exact semantics") {
    withWidth("16") {
      val q = ivs.join(pts, $"lo" < $"x" && $"x" < $"hi") // interval side on the left
      q.queryExecution.executedPlan.toString should
        not include "BroadcastNestedLoopJoin"
      val got = q.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = pts.join(ivs, $"x" > $"lo" && $"x" < $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      got shouldBe want
    }
  }

  test("joins with a cross-side equality conjunct are left to the hash planner") {
    withWidth("32") {
      val p2 = pts.withColumn("g", $"pid" % 3)
      val i2 = ivs.withColumn("g2", $"iid" % 3)
      val q = p2.join(i2, $"g" === $"g2" && $"x" >= $"lo" && $"x" <= $"hi")
      val plan = q.queryExecution.executedPlan.toString
      // no Generate/explode injected — the ordinary equi-join handles it
      plan should not include "Generate"
      q.count() should be > 0L
    }
  }

  test("non-integral range columns are not rewritten") {
    withWidth("32") {
      val pd = pts.withColumn("xd", $"x".cast("double"))
      val id2 = ivs.withColumn("lod", $"lo".cast("double"))
        .withColumn("hid", $"hi".cast("double"))
      val q = pd.join(id2, $"xd" >= $"lod" && $"xd" <= $"hid")
      q.queryExecution.executedPlan.toString should
        include("BroadcastNestedLoopJoin")
    }
  }

  test("outer range joins are not rewritten (unmatched rows must survive)") {
    withWidth("32") {
      val q = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi", "left_outer")
      q.queryExecution.executedPlan.toString should
        include("BroadcastNestedLoopJoin")
    }
  }

  test("inverted intervals (lo > hi) match nothing instead of exploding descending") {
    withWidth("10") {
      val mixed = Seq((1L, 1000000000L, 0L), (2L, 0L, 10L)).toDF("iid", "lo", "hi")
      pts.join(mixed, $"x" >= $"lo" && $"x" <= $"hi")
        .select("iid").distinct().as[Long].collect().toSeq shouldBe Seq(2L)
    }
  }

  test("oversized interval raises loudly instead of exploding") {
    withWidth("2") {
      val bad = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
      val ex = intercept[Exception] {
        pts.join(bad, $"x" >= $"lo" && $"x" <= $"hi").collect()
      }
      ex.getMessage should include("RewriteRangeJoin")
    }
  }

  test("malformed width conf fails with the config NAME, not a bare NFE") {
    withWidth("fast") {
      val ex = intercept[Throwable] {
        pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi").collect()
      }
      val chain = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      chain should include("spark.graft.rangeJoin.bucketWidth")
    }
  }

  test("points adjacent to Long.MinValue bucket exactly (DECIMAL arithmetic)") {
    withWidth("16") {
      // x − pmod(x, 16) underflows a LONG for these points; the DECIMAL
      // path must keep them joining (and not tripping ANSI overflow)
      val p = Seq((1L, Long.MinValue), (2L, Long.MinValue + 5), (3L, 0L))
        .toDF("pid", "x")
      val iv = Seq((10L, Long.MinValue, Long.MinValue + 10), (11L, -5L, 5L))
        .toDF("iid", "lo", "hi")
      val q = p.join(iv, $"x" >= $"lo" && $"x" <= $"hi")
      q.queryExecution.executedPlan.toString should
        not include "BroadcastNestedLoopJoin"
      q.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq shouldBe
        Seq((1L, 10L), (2L, 10L), (3L, 11L))
    }
  }

  test("rule is off without the width conf") {
    pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi")
      .queryExecution.executedPlan.toString should
      include("BroadcastNestedLoopJoin")
  }
}
