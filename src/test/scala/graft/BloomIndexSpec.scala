package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gold.BloomIndex

class BloomIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeBucketed(n: Int, files: Int): String = {
    val dir = Files.createTempDirectory("graft_bloom").toString + "/data"
    (1L to n.toLong).toDF("k")
      .withColumn("payload", col("k") * 10)
      .repartition(files, col("k"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("pruned read ≡ filtered full read for present AND absent probes") {
    val dir = writeBucketed(n = 2000, files = 16)
    val idx = BloomIndex.build(spark, dir, "k", bits = 4096, kHashes = 5)
    idx.count() shouldBe 16L
    val full = spark.read.parquet(dir)
    // present keys, boundary keys, and absent keys (beyond the domain)
    for (v <- Seq(1L, 17L, 999L, 2000L, 2001L, 5555L, -3L)) {
      val pruned = BloomIndex.prunedRead(spark, idx, lit(v))
        .filter(col("k") === v).select("k", "payload")
        .as[(Long, Long)].collect().sortBy(_._1)
      val ref = full.filter(col("k") === v).select("k", "payload")
        .as[(Long, Long)].collect().sortBy(_._1)
      pruned shouldBe ref
    }
  }

  test("the index actually skips files on a bucketed layout") {
    val dir = writeBucketed(n = 2000, files = 16)
    val idx = BloomIndex.build(spark, dir, "k", bits = 4096, kHashes = 5)
    // each file holds ~125 of 2000 keys; 125*5 bits in 4096 → the filter
    // is sparse and a point probe must admit FAR fewer than all 16 files
    val admitted = (1L to 50L).map(v => BloomIndex.pruneFiles(idx, lit(v)).size)
    admitted.max should be <= 4
    admitted.min should be >= 1 // soundness: the holding file is always in
    // an absent key can still be admitted somewhere (false positive) but
    // never forces a full scan
    BloomIndex.pruneFiles(idx, lit(987654321L)).size should be <= 4
  }

  test("build stamps parameters; mixed-parameter indexes are rejected") {
    val dir = writeBucketed(n = 100, files = 2)
    val a = BloomIndex.build(spark, dir, "k", bits = 1024, kHashes = 3)
    a.select("bits", "k_hashes").distinct().collect().head.toSeq shouldBe Seq(1024, 3)
    val b = BloomIndex.build(spark, dir, "k", bits = 2048, kHashes = 3)
    intercept[IllegalArgumentException] {
      BloomIndex.pruneFiles(a.unionAll(b), lit(1L))
    }
    intercept[IllegalArgumentException] {
      BloomIndex.build(spark, dir, "k", bits = 1000, kHashes = 3) // not a power of two
    }
  }
}
