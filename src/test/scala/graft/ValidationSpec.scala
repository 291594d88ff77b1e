package graft

import org.apache.spark.sql.functions._
import graft.bronze.Validation
import graft.bronze.Validation._

class ValidationSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    ("u1", "Alice", 100L),
    (null.asInstanceOf[String], "Bob", 5L), // null id → first rule
    ("", "Carol", -3L),                     // empty id (trim) AND negative: first wins
    ("u4", "Dan", -1L),                     // negative balance
    ("u5", "Eve", 20L)
  ).toDF("id", "name", "bal")

  private val rules = Seq(notNull("id"), notEmpty("id"), nonNegative("bal"))

  test("first matching rule wins; valid rows get null reason") {
    val reasons = Validation.tagged(df, rules)
      .select("name", "reject_reason").as[(String, String)].collect().toMap
    reasons("Alice") shouldBe null
    reasons("Bob") shouldBe "id_is_null"
    reasons("Carol") shouldBe "id_is_empty" // not bal_negative — order matters
    reasons("Dan") shouldBe "bal_negative"
    reasons("Eve") shouldBe null
  }

  test("split partitions exactly; summary counts agree") {
    val (valid, rejects) = Validation.split(df, rules)
    valid.count() shouldBe 2
    rejects.count() shouldBe 3
    val s = Validation.summarize("t", Validation.tagged(df, rules))
    s.input shouldBe 5
    s.rejected shouldBe 3
    s.rejectionRate shouldBe 0.6 +- 1e-9
  }

  test("circuit breaker trips above threshold, passes below") {
    val bad = DqSummary("t", 100, 80, 20)
    an[IllegalStateException] should be thrownBy Validation.circuitBreak(bad, 0.10)
    noException should be thrownBy Validation.circuitBreak(bad, 0.25)
  }

  test("top reject reasons ordered by count with deterministic tiebreak") {
    // distinct counts so the count ordering is actually exercised:
    // z_reason×3, a_reason×2, m_reason×1
    val rejects = Seq(
      "z_reason", "z_reason", "z_reason", "a_reason", "a_reason", "m_reason")
      .toDF("reject_reason")
    val top = Validation.topRejectReasons(rejects, 2).as[(String, Long)].collect()
    top shouldBe Array(("z_reason", 3L), ("a_reason", 2L))
    // tiebreak: equal counts resolve lexicographically
    val tied = Seq("b_r", "a_r").toDF("reject_reason")
    Validation.topRejectReasons(tied, 2).as[(String, Long)].collect() shouldBe
      Array(("a_r", 1L), ("b_r", 1L))
  }
}
