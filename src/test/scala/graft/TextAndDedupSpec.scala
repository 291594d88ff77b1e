package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.functions.TextFunctions._

class TextAndDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokens/shingles edge cases") {
    val df = Seq("  hello   world ", "ab", "", "xyz").toDF("t")
    val out = df.select(
      tokenCount($"t").as("n"),
      org.apache.spark.sql.functions.size(charShingles($"t", 3)).as("sh")
    ).as[(Int, Int)].collect()
    out(0) shouldBe ((2, 14)) // distinct 3-grams incl. spaces
    out(1) shouldBe ((1, 0))  // shorter than n → empty, not sequence(1,0)
    out(2) shouldBe ((0, 0))
    out(3) shouldBe ((1, 1))
  }

  test("portable hashes are stable and in range") {
    val Seq((h48, h32)) = Seq("spark").toDF("t")
      .select(hexHash48($"t"), hexHash32($"t")).as[(Long, Long)].collect().toSeq
    h48 should be >= 0L
    h48 should be < (1L << 48)
    h32 should be < (1L << 32)
    // recompute → identical (md5 deterministic)
    Seq("spark").toDF("t").select(hexHash48($"t")).as[Long].head() shouldBe h48
  }

  test("langId picks marker-majority language, und for no markers") {
    val df = Seq(
      "the cat and the dog of the house", // en
      "der hund und die katze ist gut",   // de
      "zzz qqq www"                       // none
    ).toDF("t")
    df.select(langId(tokens($"t"))).as[String].collect() shouldBe
      Array("en", "de", "und")
  }

  test("fused shingle-hash kernel equals the composed form, md5 and xxhash64 modes") {
    val docs = Seq(
      (1L, "The Quick brown fox"),     // lowercase must match Spark lower()
      (2L, "ab"),                      // shorter than n=3 -> empty
      (3L, ""),
      (4L, "unicode éèêë shingles"),   // multi-byte code points
      (5L, "aaaaaa"),                  // heavy duplicates -> distinct matters
      (6L, null.asInstanceOf[String])  // composed when() -> empty array
    ).toDF("doc_id", "text").repartition(2)
    import graft.functions.TextFunctions
    for (fast <- Seq(false, true)) {
      val native =
        if (fast) TextFunctions.hashedShinglesFast(col("text"), 3)
        else TextFunctions.hashedShingles(col("text"), 3)
      val composed =
        if (fast) TextFunctions.hashedShinglesFastComposed(col("text"), 3)
        else TextFunctions.hashedShinglesComposed(col("text"), 3)
      val both = docs.select(col("doc_id"), native.as("native"), composed.as("composed"))
      both.collect().foreach { r =>
        withClue(s"fast=$fast doc=${r.getLong(0)}: ") {
          val expected = if (r.isNullAt(2)) Seq.empty[Long] else r.getSeq[Long](2)
          r.getSeq[Long](1) shouldBe expected
        }
      }
    }
  }

  test("fused token-hash kernel equals transform(tokens, hexHash) at both widths") {
    // repartition(2) blocks ConvertToLocalRelation from folding the
    // expressions away before a physical plan exists
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "  leading and   trailing  "),
      (3L, ""),
      (4L, "tab\tand\nnewlinevt\fff\rcr"),
      (5L, "unicode éè tokens 42"),
      (6L, null.asInstanceOf[String])
    ).toDF("id", "text").repartition(2)
    import org.apache.spark.sql.functions.{col, transform}
    for ((hexLen, hash) <- Seq(8 -> (hexHash32 _), 15 -> (hexHash60 _))) {
      val both = docs.select(col("id"),
        graft.functions.TextNativeExpressions.token_md5_hashes(col("text"), hexLen)
          .as("native"),
        transform(tokens(col("text")), t => hash(t)).as("composed"))
      both.collect().foreach { r =>
        withClue(s"hexLen=$hexLen id=${r.getLong(0)}: ") {
          if (r.isNullAt(2)) r.isNullAt(1) shouldBe true
          else r.getSeq[Long](1) shouldBe r.getSeq[Long](2)
        }
      }
    }
  }

  test("simhash: identical texts share signature; disjoint texts differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "completely different words here")
    ).toDF("doc_id", "text")
    val sigs = NearDup.simhashSignatures(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    sigs(1L) shouldBe sigs(2L)
    sigs(1L) should not be sigs(3L)
  }

  test("exact groups find duplicates by fingerprint") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),    // same normalized form
      (3L, "something else")
    ).toDF("doc_id", "text")
    val g = NearDup.exactGroups(df, "doc_id", fingerprint($"text"))
      .select("canonical_id", "dup_count").as[(Long, Long)].collect().toSet
    g shouldBe Set((1L, 2L), (3L, 1L))
  }

  test("minhash LSH surfaces a true near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base + " today"),                     // near-dup of 1
      (3L, "entirely unrelated content with distinct vocabulary everywhere")
    ).toDF("doc_id", "text")
    val pairs = NearDup.minhashLshPairs(df, "doc_id", "text", minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("incremental dedup: batch vs store reports cross pairs only, skips re-ingested ids") {
    val base  = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content about distributed query engines"
    val store = NearDup.minhashSignatureStore(Seq(
      (1L, base),
      (2L, other),
      (3L, "historical noise alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text"), "doc_id", "text")
    val batch = Seq(
      (10L, base + " today"),       // near-dups corpus doc 1
      (11L, base + " tomorrow"),    // near-dups corpus doc 1 AND batch doc 10
      (2L,  other),                 // re-ingested known doc (same id) → skipped
      (12L, "fresh unrelated text with new vocabulary entirely")
    ).toDF("doc_id", "text")
    val got = NearDup.dedupAgainstStore(store, batch, "doc_id", "text",
        minJaccard = 0.5)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    got should contain((10L, 1L))
    got should contain((11L, 1L))
    // batch-internal near-dup (10, 11) is NOT this operator's job
    got.exists(p => p._1 == 10L && p._2 == 11L) shouldBe false
    got.exists(p => p._1 == 11L && p._2 == 10L) shouldBe false
    // identical re-ingested doc with the same id is not a "duplicate"
    got.exists(p => p._1 == 2L) shouldBe false
    // fresh doc matches nothing
    got.exists(p => p._1 == 12L) shouldBe false
  }

  test("minhash LSH hot-bucket guard bounds degenerate corpora, keeps honest pairs") {
    // 50 identical boilerplate docs = one hot bucket in every band; plus one
    // genuine near-dup pair with its own (tiny) buckets
    val hot = (1L to 50L).map(i =>
      (i, "identical boilerplate text shared by every degenerate document"))
    val near = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "the quick brown fox jumps over the lazy dog again and again today"))
    val df = (hot ++ near).toDF("doc_id", "text")
    val capped = NearDup.minhashLshPairs(df, "doc_id", "text",
      minJaccard = 0.5, maxBucketSize = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the 50-doc bucket is dropped entirely; the honest pair survives
    capped shouldBe Set((100L, 101L))
    // default cap: the same corpus yields all C(50,2) boilerplate pairs too
    NearDup.minhashLshPairs(df, "doc_id", "text", minJaccard = 0.5)
      .count() shouldBe (50L * 49 / 2 + 1)
  }

  test("simhash banded blocking is exact for maxHamming < bands and ⊇ the blocked baseline") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq(
      (1L, "a", base),
      (2L, "a", base + " tomorrow"),                       // tiny drift
      (3L, "b", base.replace("lazy", "sleepy")),           // tiny drift, other source
      (4L, "b", base),                                     // identical, other source
      (5L, "a", "completely unrelated vocabulary with zero overlapping tokens"),
      (6L, "b", "another entirely distinct document about databases and engines")
    ).toDF("doc_id", "source", "text")
    val sigs = NearDup.simhashSignatures(df, "doc_id", "text", Seq("source"))
    val banded = NearDup.simhashBandedPairs(sigs, "doc_id", maxHamming = 3, bands = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // ground truth: brute-force all-pairs over the collected signatures
    val sigMap = sigs.select("doc_id", "simhash").as[(Long, Long)].collect()
    val truth = (for {
      (a, sa) <- sigMap; (b, sb) <- sigMap
      if a < b && java.lang.Long.bitCount((sa ^ sb) & 0xFFFFFFFFL) <= 3
    } yield (a, b)).toSet
    truth should not be empty // fixture must actually exercise near-dups
    banded shouldBe truth
    // the metadata-blocked baseline at the same threshold is a strict subset
    // (it cannot see the cross-source pair (1,4))
    val baseline = NearDup.simhashPairs(sigs, "doc_id", "source", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    baseline.subsetOf(banded) shouldBe true
    banded should contain((1L, 4L))
    baseline should not contain ((1L, 4L))
  }

  test("wide (60-bit) simhash: banded blocking exact; native equals composed") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq(
      (1L, base),
      (2L, base + " tomorrow"),
      (3L, base.replace("lazy", "sleepy")),
      (4L, base),
      (5L, "completely unrelated vocabulary with zero overlapping tokens"),
      (6L, "another entirely distinct document about databases and engines")
    ).toDF("doc_id", "text")
    val sigs = NearDup.simhashSignatures(df, "doc_id", "text", bits = 60)
    // 60-bit signatures stay nonnegative (15 hex chars < 2^60)
    sigs.filter($"simhash" < 0).count() shouldBe 0
    val banded = NearDup
      .simhashBandedPairs(sigs, "doc_id", maxHamming = 4, bands = 5, bits = 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sigMap = sigs.select("doc_id", "simhash").as[(Long, Long)].collect()
    val truth = (for {
      (a, sa) <- sigMap; (b, sb) <- sigMap
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 4
    } yield (a, b)).toSet
    truth should not be empty
    banded shouldBe truth
    // native one-pass expression == composed per-bit formulation at 60 bits
    import graft.functions.TextFunctions
    val cmp = df
      .withColumn("hv", transform(TextFunctions.tokens($"text"),
        t => TextFunctions.hexHash60(t)))
      .select(
        TextFunctions.simhash($"hv", 60).as("n"),
        TextFunctions.simhashComposed($"hv", 60).as("c"))
      .filter($"n" =!= $"c").count()
    cmp shouldBe 0
  }

  test("banding width derives from the signature frame; a mismatch is loud") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val wide = NearDup.simhashSignatures(df, "doc_id", "text", bits = 60)
    // derive: no explicit width, 5 bands only divide the STAMPED 60 bits
    NearDup.simhashBandedPairs(wide, "doc_id", maxHamming = 4, bands = 5)
      .count() should be >= 0L
    // a wrong explicit width cannot silently mis-band a stamped frame
    val ex = intercept[IllegalArgumentException] {
      NearDup.simhashBandedPairs(wide, "doc_id", maxHamming = 3, bands = 4,
        bits = 32)
    }
    ex.getMessage should include("stamped")
    // the stamp survives the projections a caller typically inserts
    val projected = wide.select($"doc_id", $"simhash")
    NearDup.simhashBandedPairs(projected, "doc_id", maxHamming = 4, bands = 6)
      .count() should be >= 0L // 6 bands divide 60, not 32 — stamp carried
  }

  test("fast (xxhash64) minhash: precision 1.0 like the md5 path; high-sim pairs found by both") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base + " today"),
      (3L, base.replace("quick", "rapid")),
      (4L, "entirely unrelated content with distinct vocabulary everywhere"),
      (5L, "entirely unrelated content with distinct vocabulary everywhere too")
    ).toDF("doc_id", "text")
    // hash-independent ground truth: blocked exact Jaccard on RAW shingles
    val truth = NearDup.jaccardPairs(
      NearDup.withShingles(df.withColumn("blk", lit(1)), "text"), "doc_id", "blk", 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    def pairs(fast: Boolean) =
      NearDup.minhashLshPairs(df, "doc_id", "text", minJaccard = 0.5,
        fastHashing = fast)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map(p => ((p._1, p._2), p._3)).toMap
    val portable = pairs(fast = false)
    val fastP    = pairs(fast = true)
    // precision 1.0 in BOTH modes: every confirmed pair is a true pair with
    // the exact Jaccard (the verification stage is hash-agnostic; only
    // borderline candidate RECALL may differ between hash families)
    for (m <- Seq(portable, fastP)) {
      m.keySet.subsetOf(truth.keySet) shouldBe true
      m.foreach { case (k, j) => truth(k) shouldBe j +- 1e-12 }
    }
    // near-identical pairs band together under any hash family
    for (p <- Seq((1L, 2L), (4L, 5L))) {
      portable.keySet should contain(p)
      fastP.keySet should contain(p)
    }
  }

  test("allPairs prefix-filter join equals corpus-wide brute force; candidates are pruned") {
    // Two near-dup clusters living in DIFFERENT metadata blocks (a
    // source-blocked join would miss the cross-cluster pairs) plus noise.
    val base1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val base2 = "completely different content about spark distributed query processing engines"
    val docs = Seq(
      (1L, base1), (2L, base1 + " again"), (3L, base1.replace("quick", "rapid")),
      (10L, base2), (11L, base2 + " at scale"),
      (20L, "unrelated noise alpha beta gamma delta epsilon zeta"),
      (21L, "other unrelated words entirely distinct vocabulary set"),
      (22L, "numbers 123 456 789 mixed with text tokens here")
    ).toDF("doc_id", "text")
    val brute = NearDup.jaccardPairs(
      NearDup.withHashedShingles(docs.withColumn("blk", lit(1)), "text"),
      "doc_id", "blk", 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    val ap = NearDup.allPairsJaccard(docs, "doc_id", "text", minJaccard = 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    ap.keySet shouldBe brute.keySet
    ap.foreach { case (k, j) => brute(k) shouldBe j +- 1e-12 }
    ap.keySet should contain((1L, 2L)) // sanity: the cluster is really found
    // Candidate generation prunes: far fewer than n·(n−1)/2 = 28 pairs
    val shingled = NearDup.withHashedShingles(docs, "text")
      .select(col("doc_id"), col("shingles"))
      .filter(org.apache.spark.sql.functions.size(col("shingles")) > 0)
    val cands = NearDup.allPairsCandidates(shingled, 0.5)
      .as[(Long, Long)].collect().toSet
    cands.size should be < 28
    ap.keySet.subsetOf(cands) shouldBe true // exact recall: result ⊆ candidates
  }

  test("exact-boundary pair (J == t, |B| = t·|A|) survives the integer size filter") {
    // A ⊃ B with |A| = 20, |B| = 13 ⇒ J = 13/20 = 0.65 = t exactly. The
    // old float prefilter computed 20·0.65 = 13.000000000000002 and dropped
    // this TRUE pair; the DuckDB oracle (no such filter) keeps it.
    val shingled = Seq(
      (1L, (1L to 20L).toArray),
      (2L, (1L to 13L).toArray)
    ).toDF("doc_id", "shingles")
    val pairs = NearDup.jaccardPairs(
      shingled.withColumn("blk", lit(1)), "doc_id", "blk", 0.65)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs.head._3 shouldBe 0.65 +- 1e-12
    // and through the AllPairs prefix path: candidate + confirmed
    val cands = NearDup.allPairsCandidates(shingled, 0.65)
      .as[(Long, Long)].collect()
    cands shouldBe Array((1L, 2L))
  }

  test("allPairs dense bitmap plan ≡ forced-sparse posting plan, row-identical, codegen compiled") {
    // Random corpus over a SMALL vocabulary — the dense regime where
    // allPairsJaccard picks the bitmap plan. The sparse posting plan is
    // forced on a child session (denseVocabMax=0) and must produce the
    // IDENTICAL rows: same pairs, same exact inter/uni ints, same jaccard.
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(421L)
    val rows = (1L to 120L).map { id =>
      val n = 8 + rnd.nextInt(12)
      (id, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    def run(s: org.apache.spark.sql.SparkSession, forceSparse: Boolean) = {
      if (forceSparse) s.conf.set("spark.graft.allpairs.denseVocabMax", "0")
      val docs = s.createDataFrame(rows).toDF("doc_id", "text")
      val out = NearDup.allPairsJaccard(docs, "doc_id", "text", minJaccard = 0.6)
      (out.schema, out.select("doc_a", "doc_b", "inter", "uni", "jaccard")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
        .sortBy(p => (p._1, p._2)))
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val (denseSchema, dense) =
      try run(spark, forceSparse = false)
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    val (sparseSchema, sparse) = run(spark.newSession(), forceSparse = true)
    dense.nonEmpty shouldBe true // the corpus really produces pairs
    dense shouldBe sparse
    denseSchema.fields.map(f => (f.name, f.dataType)) shouldBe
      sparseSchema.fields.map(f => (f.name, f.dataType))
  }

  test("jaccard pairs: identical docs in same block have jaccard 1.0") {
    val df = Seq(
      (1L, "s", "abcdefgh"),
      (2L, "s", "abcdefgh"),
      (3L, "s", "zzzzzzzz")
    ).toDF("doc_id", "source", "text")
    val pairs = NearDup.jaccardPairs(
      NearDup.withShingles(df, "text"), "doc_id", "source", 0.9)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs.head._3 shouldBe 1.0
  }

  test("electCanonicalBy: canonical is the max-score member, ties to min id; singletons elect themselves") {
    val dup = "identical boilerplate body shared by the mirror pages in this corpus"
    val docs = Seq(
      (10L, dup), (11L, dup), (12L, dup),
      (20L, "a singleton document with entirely different private words")
    ).toDF("doc_id", "text")
    val clusters = graft.dedup.NearDup.dedupClusters(docs, "doc_id", "text")
    // scores favor the HIGHEST id in the cluster, with a tie between 11 and 12
    val scores = Seq((10L, 5L), (11L, 9L), (12L, 9L), (20L, 1L)).toDF("doc_id", "score")
    val out = graft.dedup.NearDup.electCanonicalBy(clusters, "doc_id", scores, "score")
      .select("doc_id", "cluster_id", "canonical_id", "canonical_score", "is_canonical")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // cluster {10,11,12}: max score 9 held by 11 and 12 → min id 11 wins
    out.filter(_._2 == 10L).map(_._3).distinct shouldBe Array(11L)
    out.filter(_._1 == 11L).head._5 shouldBe true
    out.filter(_._1 == 12L).head._5 shouldBe false
    out.filter(_._1 == 10L).head._4 shouldBe 9L
    // singleton: canonical is itself with its own score
    out.filter(_._1 == 20L).head should matchPattern {
      case (20L, 20L, 20L, 1L, true) =>
    }
  }

  test("electCanonicalBy: NULL scores lose the election; an all-NULL cluster elects its min id") {
    val clusters = Seq(
      (10L, 10L, 3), (11L, 10L, 3), (12L, 10L, 3), // one NULL, two scored
      (20L, 20L, 2), (21L, 20L, 2)                 // all scores NULL
    ).toDF("doc_id", "canonical_id", "cluster_size")
    val scores = Seq[(Long, java.lang.Long)](
      (10L, null), (11L, 7L), (12L, 9L), (20L, null), (21L, null)
    ).toDF("doc_id", "score")
    val out = graft.dedup.NearDup.electCanonicalBy(clusters, "doc_id", scores, "score")
      .select("doc_id", "canonical_id", "canonical_score", "is_canonical")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getBoolean(3)))).toMap
    // struct field ordering sorts NULL first, so without the null-rank
    // field the min-struct election would crown doc 10 (score NULL)
    out(10L) shouldBe ((12L, Some(9L), false))
    out(12L) shouldBe ((12L, Some(9L), true))
    // all-NULL cluster still elects deterministically: min id, NULL score
    out(20L) shouldBe ((20L, None, true))
    out(21L) shouldBe ((20L, None, false))
  }

  test("leakageSafeSplit: every cluster member shares one split; singletons still split by hash") {
    val dup = "the exact same boilerplate template text repeated across many mirror pages here"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup + " tail"),
      (4L, "completely unrelated document about alpha beta gamma delta"),
      (5L, "another disjoint text with its own private vocabulary entirely")
    ).toDF("doc_id", "text")
    val out = graft.dedup.NearDup.leakageSafeSplit(
      docs, "doc_id", "text", valBp = 3000, testBp = 3000)
      .select("doc_id", "canonical_id", "cluster_size", "split")
      .as[(Long, Long, Int, String)].collect()
    out.length shouldBe 5
    // one split value per cluster — the leakage guarantee
    out.groupBy(_._2).foreach { case (_, members) =>
      members.map(_._4).distinct.length shouldBe 1
    }
    // docs 1-3 cluster together (identical/near-identical), 4 and 5 are singletons
    val c1 = out.filter(r => Set(1L, 2L).contains(r._1)).map(_._2).distinct
    c1.length shouldBe 1
    out.filter(_._1 == 4L).head._3 shouldBe 1
    // the split is the canonical-keyed hash, so it equals split() on canonical_id
    val expected = graft.sampling.DeterministicSampling.split(
      out.toSeq.toDF("doc_id", "canonical_id", "cluster_size", "split_got")
        .drop("split_got"),
      col("canonical_id"), valBp = 3000, testBp = 3000)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.foreach(r => r._4 shouldBe expected(r._1))
  }
}
