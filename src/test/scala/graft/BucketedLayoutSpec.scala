package graft

import org.apache.spark.sql.functions._

import graft.gold.BucketedLayout

class BucketedLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def cleanTables(names: String*): Unit = {
    val wh = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse")
    names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(wh, t)
      if (d.exists()) graft.core.Fs.rmTree(d)
    }
  }

  test("published gold tables join AND aggregate without a shuffle exchange") {
    cleanTables("g_dim_user", "g_fact_daily")
    val dim = (0L until 200L).map(sk => (sk, s"user$sk", if (sk % 2 == 0) "pro" else "free"))
      .toDF("user_sk", "user_name", "tier")
    val fact = (1 to 5000).map(i => (i.toLong % 200, s"2024-01-${i % 28 + 1}", i * 1.5))
      .toDF("user_sk", "day", "value")
    BucketedLayout.publish(dim, "g_dim_user", "user_sk", buckets = 8)
    BucketedLayout.publish(fact, "g_fact_daily", "user_sk", buckets = 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedLayout.read(spark, "g_fact_daily")
        .join(BucketedLayout.read(spark, "g_dim_user"), Seq("user_sk"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      // the serving aggregation on the bucket key is also exchange-free
      val agg = BucketedLayout.read(spark, "g_fact_daily")
        .groupBy("user_sk").agg(sum("value").as("total"))
      agg.queryExecution.executedPlan.toString should
        not include "Exchange hashpartitioning"

      // negative control: aggregating on a NON-bucket key must shuffle —
      // proves the assertion can fail
      val aggDay = BucketedLayout.read(spark, "g_fact_daily")
        .groupBy("day").agg(sum("value"))
      aggDay.queryExecution.executedPlan.toString should
        include("Exchange hashpartitioning")

      // values round-trip exactly
      joined.count() shouldBe 5000
      agg.as[(Long, Double)].collect().toMap.apply(0L) shouldBe
        (200 to 5000 by 200).map(_ * 1.5).sum
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("re-publish is idempotent (C6): same rows, still bucketed") {
    cleanTables("g_repub")
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    BucketedLayout.publish(df, "g_repub", "k", buckets = 4)
    BucketedLayout.publish(df, "g_repub", "k", buckets = 4)
    BucketedLayout.read(spark, "g_repub").count() shouldBe 100
    val agg = BucketedLayout.read(spark, "g_repub").groupBy("k").count()
    agg.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
  }

  test("bucketsFor sizes to ~1 GB per bucket with a parallelism floor") {
    BucketedLayout.bucketsFor(0L) shouldBe 32
    BucketedLayout.bucketsFor(10L << 30) shouldBe 32 // floor dominates
    BucketedLayout.bucketsFor(100L << 30) shouldBe 100
    BucketedLayout.bucketsFor((100L << 30) + 1) shouldBe 101
  }
}
