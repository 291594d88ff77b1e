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
    // rows-only by nature: HLL estimates and the xxhash64 fast-hash path
    // are not reproducible in DuckDB (precision spec-proven); BPE training
    // is iterative global-argmax (and trained-table encoding is a loop per
    // word), proven against a reference impl in BpeSpec
    (qs -- os) shouldBe Set("q_a4b_approx_distinct", "q_x_minhash_lsh_fast",
      "q_x_bpe_merges", "q_x_bpe_encode_trained")
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
