package graft

import graft.curation.BpeTrainer

/** BpeTrainer vs an independent in-test reference implementation — the
  * correctness evidence for the rows-only gated q_x_bpe_merges (the
  * per-round global argmax is iterative, so no single-query DuckDB oracle
  * exists).
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala reference BPE: identical contract (word-frequency
    * statistics, end-of-word marker, count-desc then lexicographic
    * tiebreak, greedy left-to-right merge application, minCount stop).
    */
  private def referenceBpe(
      corpus: Seq[String],
      numMerges: Int,
      minCount: Long
  ): Seq[(Int, String, String, String, Long)] = {
    // mirrors TextFunctions.tokens: whitespace split, no case folding
    val wordCounts = corpus
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var words: Map[Vector[String], Long] = wordCounts.map { case (w, n) =>
      (w.map(_.toString).toVector :+ BpeTrainer.EndOfWord) -> n
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var go   = true
    while (rank < numMerges && go) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, n) <- words; i <- 0 until sym.length - 1)
        pairCounts((sym(i), sym(i + 1))) =
          pairCounts.getOrElse((sym(i), sym(i + 1)), 0L) + n
      if (pairCounts.isEmpty || pairCounts.values.max < minCount) go = false
      else {
        val ((a, b), pn) = pairCounts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head
        out += ((rank, a, b, a + b, pn))
        words = words.map { case (sym, n) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += sym(i); i += 1 }
          }
          merged.toVector -> n
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        rank += 1
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest"
  )

  test("trainBpe matches the reference implementation merge-for-merge") {
    val got = BpeTrainer
      .trainBpe(corpus.toDF("text"), "text", numMerges = 10, minCount = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    val want = referenceBpe(corpus, numMerges = 10, minCount = 2)
    got shouldBe want
    got.length should be >= 5 // the fixture genuinely trains several merges
  }

  test("minCount stops training early instead of emitting singleton merges") {
    val got = BpeTrainer
      .trainBpe(Seq("ab cd").toDF("text"), "text", numMerges = 5, minCount = 2)
      .collect()
    got shouldBe empty // every pair occurs once
  }

  test("bpeEncode applies the trained merges greedily, in rank order") {
    val df = corpus.toDF("text")
    val merges = BpeTrainer.trainBpe(df, "text", numMerges = 8, minCount = 2)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    val enc = BpeTrainer.bpeEncode(Seq("lowest low").toDF("text"), "text", merges)
      .select("bpe_symbols").as[Seq[String]].head()
    // reference: encode each word by replaying the merges
    def encodeWord(w: String): Vector[String] = {
      var sym = w.map(_.toString).toVector :+ BpeTrainer.EndOfWord
      for ((a, b) <- merges) {
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            merged += a + b; i += 2
          } else { merged += sym(i); i += 1 }
        }
        sym = merged.toVector
      }
      sym
    }
    enc shouldBe (encodeWord("lowest") ++ encodeWord("low"))
  }
}
