package graft

import org.apache.spark.sql.functions._

import graft.gold.{DataQuality, DimDate, SurrogateKeys}

class GoldOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dim_date: date_sk layout, weekend flags, full-year coverage") {
    val d = DimDate.build(spark, "2024-01-01", "2024-12-31").cache()
    d.count() shouldBe 366 // leap year
    val jan6 = d.filter($"date_sk" === 20240106).head() // a Saturday
    jan6.getAs[Boolean]("is_weekend") shouldBe true
    jan6.getAs[Int]("iso_dow") shouldBe 6
    d.filter($"is_weekend").count() shouldBe 104
    d.agg(countDistinct($"date_sk")).head().getLong(0) shouldBe 366
    // reference's four fixed-date holidays, fiscal calendar (July start),
    // leap-aware days_in_month, year_month layout
    d.filter($"is_holiday").select($"date_sk").as[Int].collect().sorted shouldBe
      Array(20240101, 20240430, 20240501, 20240902)
    val jan15 = d.filter($"date_sk" === 20240115).head()
    jan15.getAs[Int]("fiscal_year") shouldBe 2023
    jan15.getAs[Int]("fiscal_quarter") shouldBe 3
    jan15.getAs[String]("year_month") shouldBe "202401"
    val jul1 = d.filter($"date_sk" === 20240701).head()
    jul1.getAs[Int]("fiscal_year") shouldBe 2024
    jul1.getAs[Int]("fiscal_quarter") shouldBe 1
    d.filter($"month" === 2).head().getAs[Int]("days_in_month") shouldBe 29
    d.filter($"is_weekday").count() shouldBe (366 - 104)
  }

  test("surrogate keys: reference and scalable modes agree on a total order") {
    val df = (1 to 100).map(i => (100 - i, s"v$i")).toDF("k", "v")
    val ref = SurrogateKeys.referenceMode(df, Seq(col("k")), "sk", offset = 10)
      .select("k", "sk").as[(Int, Long)].collect().toMap
    val scl = SurrogateKeys.scalableMode(df, Seq(col("k")), "sk", offset = 10)
      .select("k", "sk").as[(Int, Long)].collect().toMap
    ref shouldBe scl
    ref(0) shouldBe 11L  // smallest key gets offset+1
    ref(99) shouldBe 110L
  }

  test("maxSk on empty dim is 0") {
    val empty = Seq.empty[(String, Long)].toDF("id", "sk")
    SurrogateKeys.maxSk(empty, "sk") shouldBe 0L
  }

  test("fk integrity: dangling SKs found, unknown member excluded") {
    val fact = Seq(1L, 2L, 0L, 99L).toDF("sk")
    val dim  = Seq(1L, 2L, 3L).toDF("sk")
    DataQuality.danglingSks(fact, dim, "sk").as[Long].collect() shouldBe Array(99L)
    DataQuality.fkMapRate(fact, "sk") shouldBe 0.75 +- 1e-9
  }

  test("constraint violations isolate exactly the bad rows (fixture A.2)") {
    val fact = Seq(
      (1L, 5L, 3L, 2L),  // ok: 5 = 3+2
      (2L, 5L, 3L, 1L)   // violation
    ).toDF("sk", "total", "priv", "pub")
    val v = DataQuality.violations(fact, $"total" === $"priv" + $"pub")
    v.select("sk").as[Long].collect() shouldBe Array(2L)
  }

  test("profile: per-column counts/nulls/distinct/min/max in one pass, long format") {
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 10),
      (3L, Some("b"), 30),
      (4L, Some("a"), 30)
    ).toDF("id", "s", "v")
    val p = DataQuality.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    p("id") shouldBe ((4L, 4L, 4L, "1", "4"))
    p("s")  shouldBe ((4L, 3L, 2L, "a", "b"))  // null ignored by count/distinct/min
    p("v")  shouldBe ((4L, 4L, 2L, "10", "30"))
    // approx mode keeps the schema and row count (estimates, no Expand)
    DataQuality.profile(df, Seq("id", "s", "v"), exact = false).count() shouldBe 3
  }

  test("histogram: exact integer bin edges, outliers clamp to edge bins") {
    val vals = Seq(-5L, 0L, 9L, 10L, 19L, 55L, 99L, 100L, 1000L).toDF("v")
    // [0, 99] in 10 buckets of width 10; -5 clamps to bin 0, 100/1000 to bin 9
    val h = DataQuality.histogram(vals, $"v", lo = 0L, hi = 99L, bins = 10)
      .select("bin", "n", "total", "bin_lo")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    h(0L) shouldBe ((3L, 4L, 0L))       // -5, 0, 9
    h(1L) shouldBe ((2L, 29L, 10L))     // 10, 19
    h(5L) shouldBe ((1L, 55L, 50L))
    h(9L) shouldBe ((3L, 1199L, 90L))   // 99 + clamped 100, 1000
    h.keySet shouldBe Set(0L, 1L, 5L, 9L)
  }

  test("histogram: bin_lo labels are exact when the range is NOT divisible by bins") {
    // [0, 10] in 4 bins: bin(v) = floor(v*4/11) ⇒ bins cover {0..2},{3..5},
    // {6..8},{9,10}; true lower edges 0,3,6,9 (NOT the naive 0,2,4,6)
    val vals = (0L to 10L).toDF("v")
    val h = DataQuality.histogram(vals, $"v", lo = 0L, hi = 10L, bins = 4)
      .select("bin", "n", "bin_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    h(0L) shouldBe ((3L, 0L))
    h(1L) shouldBe ((3L, 3L))
    h(2L) shouldBe ((3L, 6L))
    h(3L) shouldBe ((2L, 9L))
    // every value lands in the bin whose [bin_lo, next_bin_lo) covers it —
    // i.e. the label matches the partition the bin formula actually produces
    h.keySet shouldBe Set(0L, 1L, 2L, 3L)
  }
}
