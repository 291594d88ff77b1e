package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.Scd2

class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val changes = Seq(
    ("U001", ts("2024-01-01 00:00:00"), "US"),
    ("U001", ts("2024-01-05 00:00:00"), "US"), // no change → dropped
    ("U001", ts("2024-02-01 00:00:00"), "CA"), // change → v2
    ("U002", ts("2024-01-03 00:00:00"), "UK")
  ).toDF("user_id", "change_ts", "country")

  test("initial load: versions, end-dating, current flags (reference fixture A.2)") {
    val dim = Scd2.initialLoad(changes, Seq("user_id"), "change_ts", Seq("country"))
    val u1 = dim.filter($"user_id" === "U001")
      .orderBy("effective_start_ts")
      .select("country", "effective_end_ts", "is_current")
      .as[(String, Timestamp, Boolean)].collect()
    u1 shouldBe Array(
      ("US", ts("2024-02-01 00:00:00"), false),
      ("CA", Timestamp.valueOf(Scd2.HighTs), true))
    dim.filter($"user_id" === "U002").count() shouldBe 1
  }

  private def invariants(dim: DataFrame): Unit = {
    // exactly one current row per key
    dim.groupBy("user_id")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n"))
      .filter($"n" =!= 1).count() shouldBe 0
    // intervals are contiguous: end of version k = start of version k+1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("effective_start_ts")
    dim.withColumn("next_start", lead($"effective_start_ts", 1).over(w))
      .filter($"next_start".isNotNull && $"effective_end_ts" =!= $"next_start")
      .count() shouldBe 0
    // no overlaps / zero-length intervals
    dim.filter($"effective_end_ts" <= $"effective_start_ts").count() shouldBe 0
  }

  test("property: random change logs — invariants hold and merge == full rebuild") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val nKeys = 1 + rnd.nextInt(4)
      val n     = 1 + rnd.nextInt(24)
      val rows = Seq.fill(n) {
        (s"K${1 + rnd.nextInt(nKeys)}",
          new Timestamp(86400000L * (1 + rnd.nextInt(50))),
          Seq("a", "b", "c")(rnd.nextInt(3)))
      }.distinctBy(r => (r._1, r._2)) // one observation per (key, ts)

      withClue(s"trial $trial rows=$rows: ") {
        val df  = rows.toDF("user_id", "change_ts", "val")
        val dim = Scd2.initialLoad(df, Seq("user_id"), "change_ts", Seq("val"))
        invariants(dim)

        // incremental merge of a split log must equal the full rebuild
        val cut = new Timestamp(86400000L * 25)
        val existing = Scd2.initialLoad(
          df.filter($"change_ts" < cut), Seq("user_id"), "change_ts", Seq("val"))
        val merged = Scd2.incrementalMerge(
          existing, df.filter($"change_ts" >= cut), Seq("user_id"), "change_ts", Seq("val"))
        invariants(merged) // merged output must satisfy SCD2 invariants itself
        val cols = Seq("user_id", "val", "effective_start_ts", "effective_end_ts", "is_current")
        // multiset compare (toSet would hide duplication bugs in the merge)
        def rowsOf(d: org.apache.spark.sql.DataFrame) =
          d.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
        rowsOf(merged) shouldBe rowsOf(dim)
      }
    }
  }

  test("unknown row union keeps schema") {
    val dim = Scd2.initialLoad(changes, Seq("user_id"), "change_ts", Seq("country"))
    val unknown = Seq(("UNKNOWN", ts("1970-01-01 00:00:00"), "XX",
      ts("1970-01-01 00:00:00"), Timestamp.valueOf(Scd2.HighTs), true))
      .toDF("user_id", "change_ts", "country",
        "effective_start_ts", "effective_end_ts", "is_current")
    val out = Scd2.withUnknownRow(dim, unknown)
    out.count() shouldBe dim.count() + 1
    out.filter($"user_id" === "UNKNOWN").count() shouldBe 1
  }

  test("pointInTimeLookup: effective version per fact ts, NULL before history, row-count preserved") {
    val dim = Scd2.initialLoad(changes, Seq("user_id"), "change_ts", Seq("country"))
    val facts = Seq(
      ("F1", "U001", ts("2023-12-31 00:00:00")), // before first version → NULL
      ("F2", "U001", ts("2024-01-01 00:00:00")), // start is inclusive → US
      ("F3", "U001", ts("2024-01-20 00:00:00")), // mid-interval → US
      ("F4", "U001", ts("2024-02-01 00:00:00")), // old end exclusive, new start inclusive → CA
      ("F5", "U001", ts("2025-06-01 00:00:00")), // open current interval → CA
      ("F6", "U003", ts("2024-06-01 00:00:00"))  // unknown key → NULL
    ).toDF("fact_id", "user_id", "fact_ts")
    val out = Scd2.pointInTimeLookup(facts, dim, Seq("user_id"), "fact_ts",
      startCol = "effective_start_ts", endCol = "effective_end_ts")
    out.count() shouldBe facts.count() // at most one version matches
    val by = out.select("fact_id", "country").as[(String, Option[String])]
      .collect().toMap
    by shouldBe Map("F1" -> None, "F2" -> Some("US"), "F3" -> Some("US"),
      "F4" -> Some("CA"), "F5" -> Some("CA"), "F6" -> None)
    // all fact columns preserved, dim attrs appended
    out.columns should contain allOf ("fact_id", "user_id", "fact_ts", "country")
  }

  test("pointInTimeLookup plans an equi-join on the NK, not a nested-loop range join") {
    val dim = Scd2.initialLoad(changes, Seq("user_id"), "change_ts", Seq("country"))
    val facts = Seq(("F1", "U001", ts("2024-01-20 00:00:00")))
      .toDF("fact_id", "user_id", "fact_ts")
    val plan = Scd2.pointInTimeLookup(facts, dim, Seq("user_id"), "fact_ts")
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
