package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalJoin, SnapshotDiff}

/** IncrementalJoin.mergeJoinView: the maintained view must equal the full
  * re-join of the new snapshots under every delta class on both sides
  * (insert / update / delete), including fan-out (one customer, many
  * orders) and NULL join keys.
  */
class IncrementalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // A side: orders (pk oid, join key cust); B side: customers (pk cid)
  private def ordersOf(rows: Seq[(Long, java.lang.Long, String)]): DataFrame =
    rows.toDF("oid", "cust", "status")
  private def custOf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("cid", "cname")

  private def maintain(
      aOld: DataFrame, aNew: DataFrame,
      bOld: DataFrame, bNew: DataFrame): (DataFrame, DataFrame) = {
    val dA = SnapshotDiff.diff(aOld, aNew, Seq("oid"), Seq("cust", "status"))
    val dB = SnapshotDiff.diff(bOld, bNew, Seq("cid"), Seq("cname"))
    val view = aOld.join(bOld, col("cust") === col("cid"))
    val merged = IncrementalJoin.mergeJoinView(
      view, aOld, dA, Seq("oid"), bOld, dB, Seq("cid"),
      on = Seq("cust" -> "cid"))
    val full = aNew.join(bNew, col("cust") === col("cid"))
    (merged, full)
  }

  private def rows(df: DataFrame) =
    df.select("oid", "cust", "status", "cid", "cname")
      .as[(Long, Option[Long], String, Long, String)].collect().toList.sorted

  test("maintained view == full re-join under inserts/updates/deletes on both sides") {
    val aOld = ordersOf(Seq(
      (1L, 10L, "ok"),     // untouched
      (2L, 10L, "stale"),  // update: status changes
      (3L, 20L, "ok"),     // delete: order leaves
      (4L, 30L, "ok"),     // untouched, but ITS CUSTOMER updates
      (5L, 40L, "ok")      // untouched, but its customer is deleted
    ))
    val aNew = ordersOf(Seq(
      (1L, 10L, "ok"),
      (2L, 10L, "fresh"),
      (4L, 30L, "ok"),
      (5L, 40L, "ok"),
      (6L, 20L, "ok"),     // insert on kept customer
      (7L, 50L, "ok")      // insert joining an INSERTED customer (Δ⋈Δ term)
    ))
    val bOld = custOf(Seq(10L -> "a", 20L -> "b", 30L -> "old-c", 40L -> "d"))
    val bNew = custOf(Seq(10L -> "a", 20L -> "b", 30L -> "new-c", 50L -> "e"))
    val (merged, full) = maintain(aOld, aNew, bOld, bNew)
    rows(merged) shouldBe rows(full)
    // sanity on the scenario itself: customer-40 orders vanish with the
    // customer, order 7 ⋈ customer 50 arrives purely from the delta terms
    rows(full).map(_._1) shouldBe List(1L, 2L, 4L, 6L, 7L)
  }

  test("NULL join keys never join (SQL inner-join semantics), NULL PKs still tracked") {
    val aOld = ordersOf(Seq((1L, 10L, "ok"), (2L, null, "ok")))
    val aNew = ordersOf(Seq((1L, 10L, "ok"), (2L, null, "moved")))
    val bOld = custOf(Seq(10L -> "a"))
    val bNew = custOf(Seq(10L -> "a"))
    val (merged, full) = maintain(aOld, aNew, bOld, bNew)
    rows(merged) shouldBe rows(full)
    rows(merged).map(_._1) shouldBe List(1L)
  }

  test("no-op deltas return the view unchanged") {
    val a = ordersOf(Seq((1L, 10L, "ok"), (2L, 20L, "ok")))
    val b = custOf(Seq(10L -> "a", 20L -> "b"))
    val (merged, full) = maintain(a, a, b, b)
    rows(merged) shouldBe rows(full)
    rows(merged) should have size 2
  }

  test("delta terms stay broadcast — no shuffle join anywhere in the merge plan") {
    val aOld = ordersOf(Seq((1L, 10L, "ok"), (2L, 20L, "ok")))
    val aNew = ordersOf(Seq((1L, 10L, "ok"), (2L, 20L, "x"), (3L, 10L, "ok")))
    val bOld = custOf(Seq(10L -> "a", 20L -> "b"))
    val bNew = custOf(Seq(10L -> "a", 20L -> "b2"))
    // Materialize the deltas first: computing a diff IS a co-partitioned
    // full-outer shuffle by design. The claim under test is that the MERGE
    // adds no shuffle join of its own once the batch-sized deltas exist.
    val dA = SnapshotDiff.diff(aOld, aNew, Seq("oid"), Seq("cust", "status"))
      .localCheckpoint()
    val dB = SnapshotDiff.diff(bOld, bNew, Seq("cid"), Seq("cname"))
      .localCheckpoint()
    val view = aOld.join(bOld, col("cust") === col("cid")).localCheckpoint()
    val merged = IncrementalJoin.mergeJoinView(
      view, aOld, dA, Seq("oid"), bOld, dB, Seq("cid"),
      on = Seq("cust" -> "cid"))
    merged.collect() // AQE finalizes the plan only on execution
    val plan = merged.queryExecution.executedPlan.toString
    plan should not include "SortMergeJoin"
    plan should not include "ShuffledHashJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
