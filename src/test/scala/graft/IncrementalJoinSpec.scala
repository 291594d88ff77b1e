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

  test("property fuzz: CHAINED maintenance == model join over 60 random delta sequences") {
    // RetractableAggSpec's posture for the join view: random evolution
    // sequences on BOTH sides (keep/update/delete per row + fresh
    // inserts, NULL join keys included), the view carried FORWARD across
    // steps (so a step-k bug compounds and cannot hide), compared
    // against a driver-side model of the inner join after every step.
    val rnd = new scala.util.Random(20260814L)
    def randCust(): java.lang.Long =
      if (rnd.nextInt(10) == 0) null
      else java.lang.Long.valueOf(1L + rnd.nextInt(6))
    for (seq <- 0 until 60) {
      var aRows: Map[Long, (java.lang.Long, String)] =
        (0 until (2 + rnd.nextInt(6))).map(i =>
          i.toLong -> (randCust(), s"s$seq-$i")).toMap
      var bRows: Map[Long, String] =
        (1 to 6).filter(_ => rnd.nextBoolean())
          .map(c => c.toLong -> s"c$seq-$c").toMap
      var nextOid = 100L
      def aDf(m: Map[Long, (java.lang.Long, String)]): DataFrame =
        ordersOf(m.toSeq.map { case (k, (c, s)) => (k, c, s) })
      def bDf(m: Map[Long, String]): DataFrame = custOf(m.toSeq)
      var view = aDf(aRows).join(bDf(bRows), col("cust") === col("cid"))
        .localCheckpoint()
      for (step <- 0 until 2) {
        val aNewRows = aRows.flatMap { case (k, (c, s)) =>
          rnd.nextInt(100) match {
            case x if x < 60 => Some(k -> (c, s))
            case x if x < 85 => Some(k -> (randCust(), s + "'"))
            case _           => None
          }
        } ++ (0 until rnd.nextInt(3)).map { _ =>
          nextOid += 1; nextOid -> (randCust(), s"new$nextOid")
        }
        val bNewRows = bRows.flatMap { case (k, n) =>
          rnd.nextInt(100) match {
            case x if x < 60 => Some(k -> n)
            case x if x < 85 => Some(k -> (n + "'"))
            case _           => None
          }
        } ++ (1 to 6).filter(c => !bRows.contains(c.toLong))
          .filter(_ => rnd.nextInt(3) == 0).map(c => c.toLong -> s"b$seq-$step-$c")
        val aOldDf = aDf(aRows); val bOldDf = bDf(bRows)
        val dA = SnapshotDiff.diff(aOldDf, aDf(aNewRows), Seq("oid"), Seq("cust", "status"))
        val dB = SnapshotDiff.diff(bOldDf, bDf(bNewRows), Seq("cid"), Seq("cname"))
        view = IncrementalJoin.mergeJoinView(
          view, aOldDf, dA, Seq("oid"), bOldDf, dB, Seq("cid"),
          on = Seq("cust" -> "cid")).localCheckpoint()
        val expected = (for {
          (oid, (c, st)) <- aNewRows.toSeq
          if c != null && bNewRows.contains(c.longValue())
        } yield (oid, Option(c.longValue()), st, c.longValue(),
          bNewRows(c.longValue()))).sorted
        withClue(s"seq $seq step $step: ") {
          rows(view) shouldBe expected.toList
        }
        aRows = aNewRows; bRows = bNewRows
      }
    }
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
