package graft

import graft.bronze.Validation.DqSummary
import graft.runner.Reports
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ReportsSpec extends AnyFunSuite with Matchers {

  test("toJson escapes control characters, quotes, and backslashes") {
    val ctl = "a" + 1.toChar + "b"
    val json = Reports.toJson(Map(
      "sql"  -> "SELECT *\nFROM \"t\"\twhere x = '\\d'",
      "ctl"  -> ctl,
      "nan"  -> Double.NaN,
      "list" -> Seq(1, "two", null)
    ))
    json should include("\\n")
    json should include("\\\"t\\\"")
    json should include("\\t")
    json should include("\\\\d")
    json should include("\\u0001")
    json should include("\"nan\":null")
    json should include("[1,\"two\",null]")
    // must round-trip through a strict JSON parser (the driver uses one)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    tree.get("ctl").asText() shouldBe ctl
    tree.get("sql").asText() should include("\n")
  }

  test("bronzeSummary aggregates per-table and overall rates") {
    val m = Reports.bronzeSummary("2024-06-01", Seq(
      DqSummary("a", 100, 90, 10), DqSummary("b", 100, 100, 0)))
    m("total_input_rows") shouldBe 200L
    m("total_rejected_rows") shouldBe 10L
    m("overall_rejection_rate").asInstanceOf[Double] shouldBe 0.05 +- 1e-12
  }
}
