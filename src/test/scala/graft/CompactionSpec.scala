package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gold.Compaction

class CompactionSpec extends SparkSpecBase {
  import spark.implicits._

  test("compaction preserves content exactly, reduces file count, leaves no staging dirs") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    (1L to 2000L).map(i => (i, i * 3)).toDF("k", "v")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().sorted

    val (n0, total, target) = Compaction.plan(spark, dir, 1L << 30)
    n0 shouldBe 32L
    total should be > 0L
    target shouldBe 1

    Compaction.compact(spark, dir, 1L << 30) shouldBe 1
    val after = spark.read.parquet(dir)
    after.select(countDistinct(col("_metadata.file_path"))).as[Long].head() shouldBe 1L
    after.as[(Long, Long)].collect().sorted shouldBe before

    // atomic publish: no tmp / old directories survive
    new java.io.File(dir + ".__compact_tmp").exists() shouldBe false
    new java.io.File(dir + ".__compact_old").exists() shouldBe false

    // idempotent: compacting a compacted table is a no-op-shaped rewrite
    Compaction.compact(spark, dir, 1L << 30) shouldBe 1
    spark.read.parquet(dir).as[(Long, Long)].collect().sorted shouldBe before
  }

  test("bucketed compaction keeps each key in exactly one output file") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/b"
    (1L to 4000L).map(i => (i % 8, i)).toDF("k", "v")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().sorted

    // small target → several output files, hash-bucketed on k
    val (_, total, _) = Compaction.plan(spark, dir, 1L << 30)
    val outFiles = Compaction.compact(spark, dir, math.max(1L, total / 4), Seq("k"))
    outFiles should be >= 2

    val placement = spark.read.parquet(dir)
      .groupBy("k").agg(countDistinct(col("_metadata.file_path")).as("nf"))
      .select("nf").as[Long].collect()
    all(placement) shouldBe 1L
    spark.read.parquet(dir).as[(Long, Long)].collect().sorted shouldBe before
  }
}
