package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants that must hold for the correctness gate to
  * cover what it claims — pure map checks, no SparkSession needed.
  */
class ContractSpec extends AnyFunSuite with Matchers {

  test("every query has an oracle, except the documented rows-only entries") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    // round 6: no rows-only queries remain — the HLL / xxhash64 / BPE
    // queries that DuckDB cannot replicate directly now emit exact
    // components (replicated) + Spark-computed bound booleans (oracled as
    // literal true), so every query is hash-compared by the driver
    (qs -- os) shouldBe empty
    withClue("oracle entries without a registered query never run:") {
      (os -- qs) shouldBe empty
    }
  }

  test("extension, tpch, and parity query names do not collide") {
    // SparkEntry.queries merges three maps; a name collision would
    // silently shadow one side's gate coverage
    val sets = Seq(
      "extension" -> ExtensionQueries.queries.keySet,
      "tpch"      -> TpchQueries.queries.keySet,
      "parity"    -> SparkEntry.parityQueries.keySet)
    for {
      (an, a) <- sets
      (bn, b) <- sets if an < bn
    } withClue(s"$an vs $bn:") { (a intersect b) shouldBe empty }
  }
}
