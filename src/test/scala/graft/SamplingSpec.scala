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

  test("null keys hash via sentinel: sampled at rate and split consistently, never silently dropped") {
    val withNulls = Seq((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("id", "payload")
    // a null key behaves like any other key: kept at rate 100%, dropped at 0%
    DeterministicSampling.sample(withNulls, $"id", 10000).count() shouldBe 3
    DeterministicSampling.sample(withNulls, $"id", 0).count() shouldBe 0
    // all null-key rows land in ONE deterministic split (same hash), and the
    // assignment matches what sample() decides at the same threshold
    val splits = DeterministicSampling.split(withNulls, $"id", 3000, 3000)
      .filter($"id".isNull).select("split").as[String].collect().toSet
    splits.size shouldBe 1
    val nullBucket = withNulls.filter($"id".isNull)
      .select(DeterministicSampling.bucket($"id", "split")).as[Long].head()
    val expected = if (nullBucket < 3000) "val"
      else if (nullBucket < 6000) "test" else "train"
    splits.head shouldBe expected
  }

  test("stratified rates apply per stratum (including fractional rates)") {
    val out = DeterministicSampling.stratifiedSample(
      corpus, $"lang", $"id", Map("lang0" -> 0), defaultBp = 10000)
    out.filter($"lang" === "lang0").count() shouldBe 0
    out.filter($"lang" =!= "lang0").count() shouldBe 750

    // fractional rate: roughly proportional, and NESTED in a larger rate
    // (bucket < 1000 implies bucket < 5000 for the same salt) — this is
    // what catches a rate-scaling bug that 0/10000 can't see
    val r10 = DeterministicSampling.stratifiedSample(
      corpus, $"lang", $"id", Map("lang1" -> 1000), defaultBp = 5000)
    val lang1At10 = r10.filter($"lang" === "lang1").as[(Long, String)].collect().map(_._1).toSet
    lang1At10.size.toDouble shouldBe 25.0 +- 20.0 // 10% of 250, hash-uniform
    val r50 = DeterministicSampling.stratifiedSample(
      corpus, $"lang", $"id", Map("lang1" -> 5000), defaultBp = 5000)
    val lang1At50 = r50.filter($"lang" === "lang1").as[(Long, String)].collect().map(_._1).toSet
    lang1At10.subsetOf(lang1At50) shouldBe true
    lang1At50.size should be > lang1At10.size
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

  test("weightedSample: full weight equals plain sample; zero weight drops; monotone in weight") {
    val full = DeterministicSampling
      .weightedSample(corpus, $"id", lit(10000L), rateBp = 3000, salt = "s0")
      .as[(Long, String)].collect().toSet
    val plain = DeterministicSampling.sample(corpus, $"id", 3000, salt = "s0")
      .as[(Long, String)].collect().toSet
    full shouldBe plain
    DeterministicSampling.weightedSample(corpus, $"id", lit(0L), 10000).count() shouldBe 0
    // monotone: a row kept at weight w is kept at any w' > w (same salt)
    val half = DeterministicSampling
      .weightedSample(corpus, $"id", lit(5000L), rateBp = 3000, salt = "s0")
      .as[(Long, String)].collect().toSet
    half.subsetOf(full) shouldBe true
    half.size.toDouble shouldBe (full.size / 2.0) +- 40.0
    // out-of-range weights clamp instead of misbehaving
    val over = DeterministicSampling
      .weightedSample(corpus, $"id", lit(99999L), rateBp = 3000, salt = "s0")
      .as[(Long, String)].collect().toSet
    over shouldBe full
  }

  test("quotaCap: exactly min(cap, |group|) survivors, identical to the row_number formulation") {
    // skewed groups: lang0 has 850 rows, others 50 each
    val skewed = (0L until 1000L)
      .map(i => (i, if (i < 850) "big" else s"small${i % 3}"))
      .toDF("id", "grp")
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val prio = DeterministicSampling.bucket($"id", "q0")
      val w = Window.partitionBy("grp").orderBy(prio, $"id")
      skewed.withColumn("rn", row_number().over(w)).filter($"rn" <= 20)
        .select("id", "grp").as[(Long, String)].collect().toSet
    }
    for (margin <- Seq(1, 4, 100)) { // margin=1 exercises the exactness fallback
      val got = DeterministicSampling
        .quotaCap(skewed, Seq("grp"), $"id", cap = 20, margin = margin)
        .as[(Long, String)].collect().toSet
      got shouldBe expected
    }
    // under-quota groups pass through untouched (50 < 100)
    val loose = DeterministicSampling.quotaCap(skewed, Seq("grp"), $"id", cap = 900)
      .as[(Long, String)].collect().toSet
    loose shouldBe skewed.as[(Long, String)].collect().toSet
  }

  test("quotaCap: NULL group is a real group; zero-kept prune falls back instead of dropping") {
    // null-group rows must be capped like any group, not silently dropped
    // by a null-unsafe counts join
    val withNull = (0L until 200L)
      .map(i => (i, if (i % 4 == 0) null else s"g${i % 2}"))
      .toDF("id", "grp")
    val sizes = DeterministicSampling.quotaCap(withNull, Seq("grp"), $"id", cap = 5)
      .groupBy("grp").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    sizes shouldBe Map(None -> 5L, Some("g0") -> 5L, Some("g1") -> 5L)

    // adversarial hash clustering: every key's bucket sits far above the
    // prune threshold (margin=1, cap=2, n=40 → thr=501), so the prune keeps
    // ZERO rows — the group must fall back to the full window, not vanish
    val highIds = spark.range(0, 5000)
      .withColumn("b", DeterministicSampling.bucket($"id", "q0"))
      .filter($"b" >= 6000).limit(40).select("id").as[Long].collect()
    highIds.length shouldBe 40
    val adversarial = highIds.toSeq.map(i => (i, "hot")).toDF("id", "grp")
    val capped = DeterministicSampling
      .quotaCap(adversarial, Seq("grp"), $"id", cap = 2, margin = 1)
      .select("id").as[Long].collect().toSet
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("grp")
        .orderBy(DeterministicSampling.bucket($"id", "q0"), $"id")
      adversarial.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
        .select("id").as[Long].collect().toSet
    }
    capped shouldBe expected
    capped.size shouldBe 2
  }

  test("mixToShares: integer mixture math, scarcest source binds, others dropped") {
    // a:60 b:30 c:300 rows at shares 50/30/20% → S=10000;
    // T = min(60·10000/5000, 30·10000/3000, 300·10000/2000) = 100
    // caps: a=50, b=30, c=20; source 'other' is not in the mixture
    val rows = (0L until 60L).map(i => (i, "a")) ++
      (100L until 130L).map(i => (i, "b")) ++
      (1000L until 1300L).map(i => (i, "c")) ++
      (5000L until 5010L).map(i => (i, "other"))
    val df = rows.toDF("id", "src")
    val out = DeterministicSampling.mixToShares(df, "src",
      Map("a" -> 5000, "b" -> 3000, "c" -> 2000), $"id")
    val sizes = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes shouldBe Map("a" -> 50L, "b" -> 30L, "c" -> 20L)
    // survivors are exactly the hash-priority top-cap per source
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("src")
        .orderBy(DeterministicSampling.bucket($"id", "m0"), $"id")
      df.filter($"src".isin("a", "b", "c"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= when($"src" === "a", 50)
          .when($"src" === "b", 30).otherwise(20))
        .select("id", "src").as[(Long, String)].collect().toSet
    }
    out.as[(Long, String)].collect().toSet shouldBe expected
  }

  test("mixToShares: a configured source with no rows fails loudly") {
    val df = Seq((1L, "a"), (2L, "a")).toDF("id", "src")
    an[IllegalArgumentException] should be thrownBy
      DeterministicSampling.mixToShares(df, "src",
        Map("a" -> 5000, "ghost" -> 5000), $"id")
  }

  test("mixToShares: non-string source column works and keeps its schema") {
    // shares keys are strings; an INTEGER source column must be matched via
    // a canonical string cast, not crash on getAs[String]
    val rows = (0L until 40L).map(i => (i, 1)) ++ (100L until 120L).map(i => (i, 2))
    val df   = rows.toDF("id", "src")
    val out  = DeterministicSampling.mixToShares(df, "src",
      Map("1" -> 5000, "2" -> 5000), $"id")
    out.schema("src").dataType.typeName shouldBe "integer" // schema preserved
    val sizes = out.groupBy("src").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // T = min(40·10000/5000, 20·10000/5000) = 40 → caps 20/20
    sizes shouldBe Map(1 -> 20L, 2 -> 20L)
  }
}
