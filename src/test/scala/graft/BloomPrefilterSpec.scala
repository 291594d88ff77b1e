package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrefilter

/** BloomPrefilter: no false negatives ever; composed semi/anti joins are
  * exact even at deliberately tiny bitset sizes (maximal false-positive
  * pressure); deterministic bitsets.
  */
class BloomPrefilterSpec extends SparkSpecBase {
  import spark.implicits._

  test("prefilter has no false negatives: every inserted key survives") {
    val keys  = (0L until 500L).toDF("k")
    val bloom = BloomPrefilter.build(keys, col("k"), numBits = 1024, numHashes = 5)
    val kept  = BloomPrefilter.prefilter(keys, col("k"), bloom, 1024, 5)
    kept.count() shouldBe 500L
  }

  test("semiJoin is exact under heavy false-positive pressure (64-bit filter)") {
    val left  = (0L until 2000L).map(i => (i, s"row$i")).toDF("lk", "lv")
    val right = (0L until 2000L by 13).toDF("rk")
    // 64 bits for ~154 keys: the bitset is near-saturated — almost every
    // probe is a bloom positive; the exact join must still prune them all
    val got = BloomPrefilter.semiJoin(left, col("lk"), right, col("rk"),
      numBits = 64, numHashes = 3)
    val want = left.join(right, col("lk") === col("rk"), "left_semi")
    got.select("lk").as[Long].collect().sorted shouldBe
      want.select("lk").as[Long].collect().sorted
  }

  test("antiJoin is exact and keeps NULL-key left rows") {
    val left = Seq(
      (java.lang.Long.valueOf(1L), "a"),
      (java.lang.Long.valueOf(26L), "b"),   // in right
      (null.asInstanceOf[java.lang.Long], "null-key"),
      (java.lang.Long.valueOf(7L), "c")
    ).toDF("lk", "lv")
    val right = (0L until 100L by 13).toDF("rk")
    val got = BloomPrefilter.antiJoin(left, col("lk"), right, col("rk"),
      numBits = 64, numHashes = 3)
    val want = left.join(right, col("lk") === col("rk"), "left_anti")
    got.select("lv").as[String].collect().sorted shouldBe
      want.select("lv").as[String].collect().sorted
    got.select("lv").as[String].collect() should contain("null-key")
  }

  test("build is deterministic: identical bitsets across runs") {
    val keys = (0L until 300L).toDF("k")
    val w1 = BloomPrefilter.build(keys, col("k"), 512, 4)
      .select("words").as[Seq[Long]].head()
    val w2 = BloomPrefilter.build(keys.repartition(7), col("k"), 512, 4)
      .select("words").as[Seq[Long]].head()
    w1 shouldBe w2
    w1.length shouldBe 8
  }
}
