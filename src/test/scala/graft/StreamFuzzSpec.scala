package graft

import graft.fuzz.StreamFuzzer

/** A streaming-replay fuzz slice inside the unit suite: a handful of
  * seeded random scenarios through the REAL replay harnesses (file
  * source, watermarks, state store, sentinel flush) against in-process
  * DuckDB batch twins. The full sweep runs via `runMain graft.StreamFuzz`
  * and its results are committed per-round as the `stream` section of the
  * round's FUZZ_r*.json artifact (first committed sweep: FUZZ_r11.json);
  * this slice keeps the generator + harness pair honest on every
  * `sbt test` at ~5 s/seed.
  */
class StreamFuzzSpec extends SparkSpecBase {

  test("seeded random streaming replays equal their DuckDB batch twins") {
    val tmpRoot =
      java.nio.file.Files.createTempDirectory("graft_streamfuzz_spec").toString
    val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      // seeds 0..10 cover all six modes (append:0/8, dedup:1/9,
      // windowed:2/5/7, session:3/6, inner:4/... , outer:10)
      val outcomes = (0L until 11L).map(StreamFuzzer.run(spark, con, tmpRoot, _))
      val failures = outcomes.filterNot(_.ok)
      withClue(failures.map(o =>
        s"seed=${o.seed} ${o.desc}: ${o.error.getOrElse("")}\n").mkString) {
        failures shouldBe empty
      }
      outcomes.count(_.sparkRows > 0) should be > 6
      outcomes.map(_.desc.takeWhile(_ != '/')).toSet shouldBe
        Set("inner", "outer", "windowed", "append", "dedup", "session")
    } finally {
      con.close()
      graft.core.Fs.rmTree(new java.io.File(tmpRoot))
    }
  }

  test("late-but-in-watermark arrivals: out-of-order join replays still equal batch") {
    val tmpRoot =
      java.nio.file.Files.createTempDirectory("graft_streamfuzz_late").toString
    val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      // first seed per join mode whose scenario actually displaces rows —
      // deterministic scan, so the slice always exercises the late path
      val lateSeeds = Seq("inner", "outer", "dedup", "session").map { m =>
        (0L until 200L).find { s =>
          val sc = StreamFuzzer.generate(s)
          sc.mode == m && sc.nLate >= 3
        }.getOrElse(fail(s"no $m scenario with late rows in seeds 0..199"))
      }
      val outcomes = lateSeeds.map(StreamFuzzer.run(spark, con, tmpRoot, _))
      withClue(outcomes.filterNot(_.ok).map(o =>
        s"seed=${o.seed} ${o.desc}: ${o.error.getOrElse("")}\n").mkString) {
        outcomes.filterNot(_.ok) shouldBe empty
      }
      outcomes.foreach(_.sparkRows should be > 0)
    } finally {
      con.close()
      graft.core.Fs.rmTree(new java.io.File(tmpRoot))
    }
  }

  test("scenario generation is deterministic per seed") {
    (0L until 20L).foreach { seed =>
      StreamFuzzer.generate(seed).sql shouldBe StreamFuzzer.generate(seed).sql
      StreamFuzzer.generate(seed).rows shouldBe StreamFuzzer.generate(seed).rows
    }
  }
}
