package graft

import org.apache.spark.sql.functions._

import graft.sampling.DeterministicSampling

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = (0L until 1000L).map(i => (i, s"lang${i % 4}"))
    .toDF("id", "lang")

  test("sample is reproducible and roughly proportional") {
    val a = DeterministicSampling.sample(corpus, $"id", 2000).as[(Long, String)].collect()
    val b = DeterministicSampling.sample(corpus, $"id", 2000).as[(Long, String)].collect()
    a shouldBe b
    a.length.toDouble shouldBe 200.0 +- 60.0 // hash-uniform, not exact
    // a different salt draws an (almost surely) different sample
    val c = DeterministicSampling.sample(corpus, $"id", 2000, salt = "other")
      .as[(Long, String)].collect()
    c.map(_._1).toSet should not be a.map(_._1).toSet
  }

  test("split membership never migrates when the corpus grows") {
    val small = DeterministicSampling.split(corpus.filter($"id" < 500), $"id", 1000, 1000)
      .select("id", "split").as[(Long, String)].collect().toMap
    val big = DeterministicSampling.split(corpus, $"id", 1000, 1000)
      .select("id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => big(id) shouldBe s }
    big.values.toSet shouldBe Set("train", "val", "test")
  }

  test("stratified rates apply per stratum") {
    val out = DeterministicSampling.stratifiedSample(
      corpus, $"lang", $"id", Map("lang0" -> 0), defaultBp = 10000)
    out.filter($"lang" === "lang0").count() shouldBe 0
    out.filter($"lang" =!= "lang0").count() shouldBe 750
  }

  test("upsample repeats rows by weight; non-positive drops") {
    val w = when($"lang" === "lang0", 3).when($"lang" === "lang1", 0).otherwise(1)
    val out = DeterministicSampling.upsample(corpus, w)
    out.filter($"lang" === "lang0").count() shouldBe 750 // 250 × 3
    out.filter($"lang" === "lang1").count() shouldBe 0
    out.filter($"lang" === "lang2").count() shouldBe 250
    out.filter($"lang" === "lang0").groupBy("id").count()
      .filter($"count" =!= 3).count() shouldBe 0
  }
}
