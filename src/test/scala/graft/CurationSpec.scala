package graft

import org.apache.spark.sql.functions._

import graft.curation.Curation

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("packSequences: deterministic contiguous packing within shards") {
    val df = Seq((1L, 1000L), (2L, 1000L), (3L, 500L), (4L, 2000L))
      .toDF("doc_id", "n_tokens")
    // one shard so the layout is a single running sum ordered by doc_id
    val out = Curation.packSequences(df, "doc_id", "n_tokens",
      budgetTokens = 2048, shards = 1)
      .select("doc_id", "start_offset", "pack_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 0L, 0L),     // [0, 1000)
      (2L, 1000L, 0L),  // [1000, 2000) — still pack 0
      (3L, 2000L, 0L),  // starts at 2000 < 2048 → pack 0 (straddles)
      (4L, 2500L, 1L))  // starts in pack 1
    // re-run → identical (hash sharding, no rand())
    Curation.packSequences(df, "doc_id", "n_tokens", 2048, shards = 4)
      .select("shard").distinct().count() should be >= 1L
  }

  test("piiScrub: urls then emails replaced and counted, no double-count") {
    val df = Seq(
      (1L, "mail me at a.b+c@example.org or see https://x.example/path?q=1 thanks"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = Curation.piiScrub(df, "text")
      .select("doc_id", "n_urls", "n_emails", "clean_text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    out(0)._2 shouldBe 1
    out(0)._3 shouldBe 1
    out(0)._4 shouldBe "mail me at <EMAIL> or see <URL> thanks"
    out(1) shouldBe ((2L, 0, 0, "no pii here at all"))
  }

  test("repetitionScore: looping text scores high; short docs absent") {
    val df = Seq(
      (1L, "a b a b a b"),          // bigrams: ab,ba,ab,ba,ab → top 3 of 5
      (2L, "all distinct words here"),
      (3L, "single")                // < 2 tokens → no row
    ).toDF("doc_id", "text")
    val out = Curation.repetitionScore(df, "doc_id", "text")
      .select("doc_id", "top_bigram_count", "n_bigrams", "rep_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    out.map(_._1) shouldBe Array(1L, 2L)
    out(0) shouldBe ((1L, 3L, 5L, 600000L))
    out(1) shouldBe ((2L, 1L, 3L, 333333L))
  }

  test("decontaminate removes normalized-fingerprint matches only") {
    val candidates = Seq(
      (1L, "The Quick, Brown Fox!"),  // normalizes to a blocked doc
      (2L, "something else entirely")
    ).toDF("doc_id", "text")
    val blocklist = Seq((99L, "the quick brown fox")).toDF("doc_id", "text")
    val kept = Curation.decontaminate(candidates, blocklist, "text")
      .select("doc_id").as[Long].collect()
    kept shouldBe Array(2L)
    // schema passthrough: no helper columns leak
    Curation.decontaminate(candidates, blocklist, "text").columns shouldBe
      Array("doc_id", "text")
  }

  test("buildVocabulary + encodeDocuments: deterministic ranks, OOV id, order preserved") {
    val docs = Seq((1L, "b a b c a b"), (2L, "a d b")).toDF("doc_id", "text")
    // counts: b=4, a=3, c=1, d=1 → ranks by (n desc, token asc)
    val vocab = Curation.buildVocabulary(docs, "text", maxSize = 3)
    vocab.select("token", "token_id").as[(String, Long)].collect().toMap shouldBe
      Map("b" -> 1L, "a" -> 2L, "c" -> 3L)
    // minCount drops the singleton tail deterministically
    Curation.buildVocabulary(docs, "text", maxSize = 10, minCount = 2L)
      .select("token").as[String].collect().toSet shouldBe Set("a", "b")
    val enc = Curation.encodeDocuments(docs, vocab, "doc_id", "text")
      .select("doc_id", "token_ids", "n_tokens")
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    enc(1L) shouldBe ((Seq(1L, 2L, 1L, 3L, 2L, 1L), 6L))
    enc(2L) shouldBe ((Seq(2L, -1L, 1L), 3L)) // 'd' is OOV
  }

  test("chunkDocuments: overlap windows reconstruct the token stream; edge sizes exact") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, ""),                                       // empty → no chunks
      (4L, (1 to 13).map(i => s"t$i").mkString(" "))  // tail lands inside overlap
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text", chunkSize = 8, overlap = 2)
      .select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect()

    out.count(_._1 == 3L) shouldBe 0
    out.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)) shouldBe Array((0L, "a b c", 3L))

    // doc 1: starts at 0,6,12 → sizes 8,8,8 (start 18 would add NOTHING
    // beyond the overlap — a pure-duplicate chunk — and is not emitted);
    // dropping the 2-token overlap from every chunk after the first
    // reconstructs the document
    val c1 = out.filter(_._1 == 1L).sortBy(_._2)
    c1.map(_._4) shouldBe Array(8L, 8L, 8L)
    val rebuilt = (c1.head._3.split(" ") ++
      c1.tail.flatMap(_._3.split(" ").drop(2))).mkString(" ")
    rebuilt shouldBe (1 to 20).map(i => s"t$i").mkString(" ")

    // doc 4 (13 tokens): start 12 would cover only token 13, already inside
    // the chunk starting at 6 → exactly two chunks, all 13 tokens covered
    val c4 = out.filter(_._1 == 4L).sortBy(_._2)
    c4.map(_._4) shouldBe Array(8L, 7L)
    (c4.head._3.split(" ") ++ c4.last._3.split(" ").drop(2)).mkString(" ") shouldBe
      (1 to 13).map(i => s"t$i").mkString(" ")

    // zero overlap partitions exactly
    val np = Curation.chunkDocuments(docs, "doc_id", "text", chunkSize = 5)
      .filter($"doc_id" === 1L)
      .select("chunk_text").as[String].collect()
    np.flatMap(_.split(" ")) shouldBe (1 to 20).map(i => s"t$i").toArray
  }

  test("native word_ngrams equals the composed form on edge shapes") {
    import graft.functions.TextFunctions.tokens
    import graft.functions.TextNativeExpressions.word_ngrams_native
    val texts = Seq("a b c d", "  leading two  spaces\tand tabs ", "one",
      "", "x y x y x y", "unicode éè ü tokens here", "ab\fc\rd\ne f",
      null) // null text -> EMPTY array in BOTH forms (composed: size(null)
            // is null so when() falls through to otherwise([]))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val native = df.select($"id",
        word_ngrams_native($"text", n).as("g")).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val composed = df.select($"id",
        Curation.wordNgrams(tokens($"text"), n).as("g")).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      withClue(s"n=$n:") { native shouldBe composed }
    }
  }

  test("native word_ngrams_all preserves multiplicity and order") {
    import graft.functions.TextNativeExpressions.word_ngrams_all_native
    val df = Seq(
      (1L, "a b a b a"),
      (2L, "one"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, " x\t y \n x  y ")
    ).toDF("id", "text")
    val out = df.select($"id", word_ngrams_all_native($"text", 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out(1L) shouldBe Seq("a b", "b a", "a b", "b a") // repeats KEPT, in order
    out(2L) shouldBe Seq.empty
    out(3L) shouldBe Seq.empty
    out(4L) shouldBe Seq.empty
    out(5L) shouldBe Seq("x y", "y x", "x y")
  }

  test("lmScore: exact ppm conditional probabilities, short docs NULL") {
    val docs = Seq(
      (1L, "a b"),       // bigrams: "a b"
      (2L, "a b a c"),   // "a b", "b a", "a c"
      (3L, "c"),         // no bigrams
      (4L, "b a")        // "b a"
    ).toDF("doc_id", "text")
    // corpus bigram counts: "a b"=2, "b a"=2, "a c"=1
    // prefix counts: a -> 3 ("a b"x2 + "a c"), b -> 2 ("b a"x2)
    // ppm: p(b|a) = 2000000/3 = 666666, p(a|b) = 2000000/2 = 1000000,
    //      p(c|a) = 1000000/3 = 333333
    val out = Curation.lmScore(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    out(1L) shouldBe ((1L, Some(666666L), Some(666666L)))
    out(2L) shouldBe ((3L, Some(666666L + 1000000L + 333333L), Some(1999999L / 3)))
    out(3L) shouldBe ((0L, None, None))
    out(4L) shouldBe ((1L, Some(1000000L), Some(1000000L)))
  }

  test("decontaminateNgram drops above-threshold overlap and reports exact counts") {
    val train = Seq(
      (1L, "a b c d e f"),   // 3-grams: abc bcd cde def → 2 shared (abc, bcd)
      (2L, "a b c x y z"),   // 1 shared (abc)
      (3L, "p q r s t u")    // 0 shared
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d q")).toDF("doc_id", "text") // 3-grams: abc bcd cdq
    val (survivors, dropped) = Curation.decontaminateNgram(
      train, eval, "doc_id", "text", n = 3, maxShared = 1)
    dropped.select("doc_id", "shared_ngrams").as[(Long, Long)].collect() shouldBe
      Array((1L, 2L))
    survivors.select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 3L)
    // maxShared = 0: any single shared n-gram contaminates
    val (s0, d0) = Curation.decontaminateNgram(
      train, eval, "doc_id", "text", n = 3, maxShared = 0)
    d0.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    s0.select("doc_id").as[Long].collect() shouldBe Array(3L)
  }

  test("noveltyScore counts shared n-grams exactly; short docs score NULL") {
    val df = Seq(
      (1L, "a b c d"),     // trigrams: "a b c", "b c d"
      (2L, "a b c x"),     // trigrams: "a b c", "b c x"
      (3L, "p q"),         // too short for n=3 → no trigrams
      (4L, "a b c a b c")  // distinct trigrams: "a b c","b c a","c a b"
    ).toDF("doc_id", "text")
    val out = Curation.noveltyScore(df, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // "a b c" appears in docs 1,2,4 (df=3); everything else df=1
    out(1L) shouldBe ((2L, 1L, 500000L))
    out(2L) shouldBe ((2L, 1L, 500000L))
    out(3L) shouldBe ((0L, 0L, -1L)) // NULL ppm
    out(4L) shouldBe ((3L, 1L, 666666L))
  }

  test("keepTopFraction keeps exactly the floor(n*frac) rank prefix") {
    // scores with heavy TIES so the tiebreak visibly decides membership
    val df = (1L to 100L).map(i => (i, (i % 10) * 10L)).toDF("id", "score")
      .repartition(4)
    val out = Curation.keepTopFraction(df, $"score", $"id", fracBp = 2500)
      .as[(Long, Long)].collect().toSet
    out.size shouldBe 25 // floor(100 * 0.25)
    // reference: plain window rank over the same total order
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy($"score".desc, $"id")))
      .filter($"rn" <= 25).select("id", "score").as[(Long, Long)].collect().toSet
    out shouldBe want
    // boundary fractions
    Curation.keepTopFraction(df, $"score", $"id", fracBp = 0).count() shouldBe 0L
    Curation.keepTopFraction(df, $"score", $"id", fracBp = 10000)
      .count() shouldBe 100L
  }

  test("maskDuplicateSpans removes corpus-duplicated n-gram spans, keeps unique text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over unique alpha"),
      (2L, "start pad the quick brown fox jumps elsewhere"),
      (3L, "totally distinct words nothing shared here at all"),
      (4L, "tiny doc"), // < n tokens: no n-grams, untouched
      (5L, "rep rep rep rep rep rep rep rep") // in-doc repetition masks itself
    ).toDF("doc_id", "text")
    val out = Curation.maskDuplicateSpans(df, "doc_id", "text", n = 4, minCount = 2)
      .select("doc_id", "clean_text", "n_tokens", "n_masked")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)

    // "the quick brown fox jumps" (5 tokens) is the shared run: its two
    // 4-grams each occur twice corpus-wide, so exactly those 5 tokens are
    // masked in doc 1 and doc 2; surrounding unique tokens survive.
    out(0) shouldBe ((1L, "over unique alpha", 8L, 5L))
    out(1) shouldBe ((2L, "start pad elsewhere", 8L, 5L))
    out(2) shouldBe ((3L, "totally distinct words nothing shared here at all", 8L, 0L))
    out(3) shouldBe ((4L, "tiny doc", 2L, 0L))
    // "rep"x8: every 4-gram is the same gram, 5 occurrences → all covered
    out(4) shouldBe ((5L, "", 8L, 8L))
  }

  test("importanceWeights ranks target-domain text above off-domain; exact quantized ratios") {
    val corpus = Seq(
      (1L, "alpha beta alpha beta"),    // pure target-domain bigrams
      (2L, "gamma delta gamma delta"),  // pure off-domain
      (3L, "alpha beta gamma delta"),   // mixed
      (4L, "solo")                      // no bigrams -> zero row
    ).toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha beta alpha beta alpha beta")).toDF("text")
    val out = graft.curation.Curation
      .importanceWeights(corpus, target, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    // target has 5 bigram instances: "alpha beta" x3, "beta alpha" x2 (Tt=5).
    // corpus has 9: doc1 (ab, ba, ab), doc2 (gd, dg, gd), doc3 (ab, bg, gd),
    // so cs: ab=3, ba=1, gd=3, dg=1, bg=1 (Ts=9).
    // r(ab) = 1e6 * (3+1)*(9+1) / ((3+1)*(5+1)) = 1666666
    // r(ba) = 1e6 * (2+1)*10 / ((1+1)*6)        = 2500000
    // r(gd) = 1e6 * (0+1)*10 / ((3+1)*6)        =  416666
    // r(dg) = r(bg) = 1e6 * 10 / ((1+1)*6)      =  833333
    out(1L) shouldBe ((3L, 1666666L * 2 + 2500000L, (1666666L * 2 + 2500000L) / 3))
    out(2L) shouldBe ((3L, 416666L * 2 + 833333L, (416666L * 2 + 833333L) / 3))
    out(3L) shouldBe ((3L, 1666666L + 833333L + 416666L,
      (1666666L + 833333L + 416666L) / 3))
    out(4L) shouldBe ((0L, 0L, -1L))
    // the resampling property: target-like > mixed > off-domain
    out(1L)._3 should be > out(3L)._3
    out(3L)._3 should be > out(2L)._3
  }

  test("maskDuplicateSpans: clean corpus (no duplicated grams) is identity") {
    val df = Seq(
      (1L, "one two three four five"),
      (2L, "six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Curation.maskDuplicateSpans(df, "doc_id", "text", n = 3, minCount = 2)
      .select("doc_id", "clean_text", "n_masked")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, "one two three four five", 0L))
    out(1) shouldBe ((2L, "six seven eight nine ten", 0L))
  }
}
