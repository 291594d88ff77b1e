package graft

import org.apache.spark.sql.functions._

import graft.similarity.CosineTopK

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("brute force: identical vector ranks first with cosine ≈ 1") {
    val queries = Seq((100L, vec(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, vec(1f, 0f, 0f)),   // identical
      (2L, vec(0.9f, 0.1f, 0f)),
      (3L, vec(0f, 1f, 0f)),   // orthogonal
      (4L, vec(-1f, 0f, 0f))   // opposite
    ).toDF("vec_id", "embedding")
    val out = CosineTopK.bruteForce(queries, corpus, "vec_id", "embedding", 4)
      .orderBy("rank")
      .select("neighbor_id", "cosine").as[(Long, Double)].collect()
    out.map(_._1) shouldBe Array(1L, 2L, 3L, 4L)
    out(0)._2 shouldBe 1.0 +- 1e-9
    out(2)._2 shouldBe 0.0 +- 1e-9
    out(3)._2 shouldBe -1.0 +- 1e-9
  }

  test("ivf with centroid probing returns the right cluster's neighbors") {
    // two well-separated clusters around e1 and e2
    val corpus = Seq(
      (10L, vec(1f, 0.01f)), (11L, vec(0.99f, 0.02f)), (12L, vec(0.98f, -0.01f)),
      (20L, vec(0.01f, 1f)), (21L, vec(0.02f, 0.99f)), (22L, vec(-0.01f, 0.98f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, vec(1f, 0f))).toDF("vec_id", "embedding")
    val out = CosineTopK.ivf(queries, corpus, "vec_id", "embedding",
      k = 3, centroidPred = col("vec_id").isin(10L, 20L), nprobe = 1)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    out.toSet shouldBe Set(10L, 11L, 12L) // only the e1 cluster searched
  }

  test("multi-probe LSH recall dominates single-probe and both are subsets of brute force") {
    val rnd = new scala.util.Random(23)
    val corpus = (10L until 400L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val queries = (0L until 5L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val truth = CosineTopK.bruteForce(queries, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(multiProbe: Boolean): Double = {
      val got = CosineTopK.lshTopK(queries, corpus, "vec_id", "embedding",
        k = 5, nBits = 5, multiProbe = multiProbe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.count(truth) / truth.size.toDouble
    }
    val single = recall(multiProbe = false)
    val multi  = recall(multiProbe = true)
    multi should be >= single
    multi should be > 0.0
    // the hash must actually spread the corpus — a degenerate hyperplane
    // family (e.g. parity of i+j) collapses to ≤3 buckets
    val nBuckets = CosineTopK.prepareNonZero(corpus, "embedding")
      .select(CosineTopK.signLshBucket(col("qv"), 5).as("b"))
      .distinct().count()
    nBuckets should be > 8L
  }

  test("LSH-bucketed embedding near-dup is sound (⊆ all-pairs) with high recall on clusters") {
    import graft.dedup.NearDup
    val rnd = new scala.util.Random(7)
    // 8 cluster centers, 10 tightly-perturbed members each
    val base = Array.fill(8)(Array.fill(16)(rnd.nextFloat() - 0.5f))
    val vecs = for { c <- 0 until 8; m <- 0 until 10 } yield
      ((c * 10 + m).toLong, base(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    val df = vecs.toDF("vec_id", "embedding")
    // ground truth: the all-pairs baseline operator with a single block
    val global = NearDup.embeddingNearDupPairs(
      df.withColumn("g", lit(1)), "vec_id", "embedding", "g", minCosine = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = NearDup.embeddingNearDupLsh(df, "vec_id", "embedding",
      minCosine = 0.9, nBits = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    global.size should be > 100 // fixture produces real near-dup mass
    // soundness: every LSH pair is a true pair (precision 1.0)
    lsh.subsetOf(global) shouldBe true
    // recall: deterministic on this fixture; floor leaves margin for the
    // clusters that happen to straddle a hyperplane
    (lsh.size.toDouble / global.size) should be >= 0.8
  }

  test("resize planning preserves aspect ratio and caps the longest side") {
    val decoded = Seq((1L, 640, 480, 3), (2L, 100, 50, 3), (3L, 200, 800, 3))
      .toDF("doc_id", "width", "height", "channels")
    val out = graft.multimodal.BinaryMedia.withResizeDims(decoded, maxDim = 256)
      .select("doc_id", "resize_width", "resize_height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    out(1L) shouldBe ((256, 192)) // 640x480 → fit 256
    out(2L) shouldBe ((100, 50))  // already fits → untouched
    out(3L) shouldBe ((64, 256))  // portrait
  }

  test("native quantizer equals the composed transform, including half-way ties and negatives") {
    // .5-after-scaling ties exercise HALF_UP vs Math.round divergence
    // (-0.5 rounds AWAY from zero under HALF_UP, toward it under
    // floor(x+0.5)); the repartition(2) blocks ConvertToLocalRelation from
    // folding the expressions away before a physical plan exists
    val vecs = Seq(
      (1L, Array(0.0f, -0.000005f, 0.000005f, 1.234567f, -7.89f)),
      (2L, Array(Float.MinPositiveValue, -1.5e-5f, 99.99999f)),
      (3L, Array.empty[Float])
    ).toDF("id", "emb").repartition(2)
    val both = vecs.select($"id",
      CosineTopK.quantize($"emb").as("native"),
      CosineTopK.quantizeComposed($"emb").as("composed"))
    both.collect().foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getSeq[Long](1) shouldBe r.getSeq[Long](2)
      }
    }
    // the mixed frame above is itself evicted (the composed lambda is
    // CodegenFallback — the exact failure mode the native kernel removes);
    // a native-only projection must stay inside codegen
    val nativeOnly = vecs.select($"id", CosineTopK.quantize($"emb").as("qv"))
    nativeOnly.collect()
    graft.plans.CodegenAudit.assertInCodegen(nativeOnly)
  }

  test("quantizer overflow throws like the ANSI cast instead of saturating") {
    // 1e18 * the quantization scale overflows BIGINT; the native kernel
    // must throw (LongExactNumeric condition) where a bare toLong would
    // silently pin at Long.MaxValue
    val vecs = Seq((1L, Array(1.0e18f))).toDF("id", "emb").repartition(2)
    val e = intercept[Exception] {
      vecs.select(CosineTopK.quantize($"emb")).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).toSeq
    chain.exists(c => c.isInstanceOf[ArithmeticException] &&
      c.getMessage.contains("BIGINT")) shouldBe true
  }

  test("quantized cosine is invariant under partitioning (the determinism the quantization buys)") {
    val rnd = new scala.util.Random(11)
    val corpus = (10L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val queries = (0L until 3L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    def run(c: org.apache.spark.sql.DataFrame) =
      CosineTopK.bruteForce(queries, c, "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    // different physical partitionings → bit-identical ranks AND scores
    // (a raw float fold would be partition-order dependent)
    run(corpus.repartition(1)) shouldBe run(corpus.repartition(7))
  }
}
