package graft

import graft.fuzz.{DiffRunner, QueryFuzzer}

/** A differential-fuzz slice inside the unit suite: 80 seeded random
  * queries from the `QueryFuzzer` grammar, executed on Spark and
  * in-process DuckDB over the sf0.001 testdata, row sets compared exactly.
  * The full 500-per-round sweep runs via `runMain graft.Fuzz` (see
  * FUZZ_r07.json for the committed results); this slice keeps the
  * generator/renderer pair honest on every `sbt test`.
  */
class FuzzSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("80 seeded random queries agree between Spark and DuckDB") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"testdata not present at $sfDir")
    val con = DiffRunner.openOracle(sfDir)
    try {
      val outcomes = (0L until 80L).map { seed =>
        DiffRunner.run(spark, sfDir, con, QueryFuzzer.generate(seed))
      }
      val failures = outcomes.filterNot(_.ok)
      withClue(failures.map(o =>
        s"seed=${o.seed} ${o.desc}: ${o.error.getOrElse("")}\n").mkString) {
        failures shouldBe empty
      }
      // the slice must exercise real data, not compare empty sets
      outcomes.count(_.sparkRows > 0) should be > 40
    } finally con.close()
  }

  test("generation is deterministic: same seed, same SQL twin") {
    (0L until 20L).foreach { seed =>
      QueryFuzzer.generate(seed).sql shouldBe QueryFuzzer.generate(seed).sql
    }
  }
}
