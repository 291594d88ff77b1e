package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.silver.{Dedup, Enrich, Impute, Tags}

class SilverOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("keepLatest: desc nulls last + explicit tiebreak") {
    val df = Seq(
      ("u1", ts("2024-01-02 00:00:00"), "b"),
      ("u1", ts("2024-01-03 00:00:00"), "c"),
      ("u1", null.asInstanceOf[Timestamp], "z"), // null ts must lose
      ("u2", ts("2024-01-01 00:00:00"), "a")
    ).toDF("id", "t", "v")
    val out = Dedup.keepLatest(df, Seq("id"), "t", Seq(col("v").desc))
      .select("id", "v").as[(String, String)].collect().toMap
    out shouldBe Map("u1" -> "c", "u2" -> "a")
  }

  test("keepFirst deterministic under ties via tiebreak column") {
    val df = Seq(("k", 1, "x"), ("k", 1, "y")).toDF("id", "t", "v")
    val out = Dedup.keepFirst(df, Seq("id"), Seq(col("t").desc, col("v")))
    out.select("v").as[String].collect() shouldBe Array("x")
  }

  test("leftWithDefaults fills non-matches; lookupSk falls back to 0") {
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("k", "fk")
    val dim  = Seq((10L, "n10")).toDF("fk", "nm")
    val e = Enrich.leftWithDefaults(fact, dim, fact("fk") === dim("fk"),
      Map("nm" -> "Unknown"))
    e.select("k", "nm").as[(Long, String)].collect().toMap shouldBe
      Map(1L -> "n10", 2L -> "Unknown")

    val dimSk = Seq((10L, 1001L)).toDF("fk", "sk")
    val l = Enrich.lookupSk(fact, dimSk, "fk", "sk")
    l.select("k", "sk").as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1001L, 2L -> 0L)
  }

  test("filterExisting == semi join; filterMissing == anti join") {
    val fact = Seq(1L, 2L, 3L).toDF("k")
    val dim  = Seq(2L, 3L, 4L).toDF("k")
    Enrich.filterExisting(fact, dim, Seq("k")).as[Long].collect().sorted shouldBe Array(2L, 3L)
    Enrich.filterMissing(fact, dim, Seq("k")).as[Long].collect() shouldBe Array(1L)
  }

  test("impute with flag records provenance") {
    val df  = Seq(("a", "x"), ("b", null.asInstanceOf[String])).toDF("k", "v")
    val out = Impute.withFlag(df, "v", lit("DEF"))
      .select("k", "v", "v_imputed").as[(String, String, Boolean)].collect().toMap2
    out("a") shouldBe ("x", false)
    out("b") shouldBe ("DEF", true)
  }

  test("tag explode + normalize + classify") {
    val raw = Seq(
      ("d1", """["Machine Learning","NLP!","nlp"]"""),
      ("d2", """["  CV  "]""")
    ).toDF("dataset_id", "Tags")
    val norm = Tags.normalized(Tags.explodeTags(raw))
    norm.select("tag_normalized").as[String].collect().sorted shouldBe
      Array("cv", "machinelearning", "nlp", "nlp")

    // total=2120: a>10%, c in (1%,10%], d ≤1% but >10 uses, e ≤10 uses
    val usage = Seq(("a", 2000L), ("c", 100L), ("d", 15L), ("e", 5L))
      .toDF("tag", "usage_count")
    val classes = Tags.classify(usage).select("tag", "tag_category")
      .as[(String, String)].collect().toMap
    classes shouldBe Map("a" -> "popular", "c" -> "common", "d" -> "regular", "e" -> "rare")
  }

  implicit class MapOps[A, B, C](arr: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = arr.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
