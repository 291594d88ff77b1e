package graft

import org.apache.spark.sql.functions._

import graft.similarity.{CosineTopK, ProductQuantizer}

/** ProductQuantizer: the defining PQ identity — ADC distance equals the
  * exact quantized distance to the RECONSTRUCTION (concatenated codewords)
  * — plus code-range, determinism, and ranking-contract checks.
  */
class ProductQuantizerSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim  = 8
  private val m    = 2
  private val dsub = 4

  // two visibly separated groups per subspace so 2 codewords per book are
  // meaningful after one Lloyd round
  private def corpusRows: Seq[(Long, Seq[Float])] = Seq(
    (10L, Seq(1f, 1f, 0f, 0f, 5f, 5f, 5f, 5f)),
    (11L, Seq(1f, 2f, 0f, 0f, 5f, 6f, 5f, 5f)),
    (12L, Seq(9f, 9f, 8f, 8f, -5f, -5f, -5f, -5f)),
    (13L, Seq(9f, 8f, 8f, 9f, -5f, -6f, -5f, -5f)),
    (14L, Seq(1f, 1f, 1f, 0f, -5f, -5f, -6f, -5f))
  )
  private def queryRows: Seq[(Long, Seq[Float])] = Seq(
    (1L, Seq(1f, 1f, 0f, 0f, 5f, 5f, 5f, 5f)),
    (2L, Seq(8f, 8f, 8f, 8f, 0f, 0f, 0f, 0f))
  )

  private def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")

  test("codes are 1-based positions within the codebook range") {
    val cb = ProductQuantizer.train(df(corpusRows), "vec_id", "embedding",
      dim, m, ksub = 2, iters = 1)
    cb.books should have size m
    val codes = ProductQuantizer.encode(df(corpusRows), "vec_id", "embedding", cb)
      .collect()
    codes.foreach { r =>
      (0 until m).foreach { i =>
        val c = r.getAs[Int](s"code_$i")
        c should be >= 1
        c should be <= cb.books(i).size
      }
    }
  }

  test("ADC identity: adc_d2(q, x) == exact d2(q, reconstruction(codes(x)))") {
    val cb = ProductQuantizer.train(df(corpusRows), "vec_id", "embedding",
      dim, m, ksub = 2, iters = 1)
    val adc = ProductQuantizer.adcTopK(df(queryRows), df(corpusRows),
      "vec_id", "embedding", cb, k = corpusRows.size)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap

    // reconstruction of each corpus row from its codes, on the quantized grid
    val codes = ProductQuantizer.encode(df(corpusRows), "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> (0 until m).map(i => r.getAs[Int](s"code_$i"))).toMap
    val recon: Map[Long, Array[Long]] = codes.map { case (id, cs) =>
      id -> cs.zipWithIndex.flatMap { case (pos, i) => cb.books(i)(pos - 1).qv }.toArray
    }
    val qQuant: Map[Long, Array[Long]] = queryRows.map { case (id, v) =>
      id -> v.map(x => Math.round(x.toDouble * CosineTopK.Scale)).toArray
    }.toMap

    for ((qid, qv) <- qQuant; (nid, rv) <- recon) {
      val d2 = qv.zip(rv).map { case (a, b) => (a - b) * (a - b) }.sum
      withClue(s"query $qid vs neighbor $nid:") {
        adc((qid, nid)) shouldBe d2
      }
    }
  }

  test("ranking is dense 1..k per query with a deterministic tiebreak") {
    val cb = ProductQuantizer.train(df(corpusRows), "vec_id", "embedding",
      dim, m, ksub = 2, iters = 1)
    val out = ProductQuantizer.adcTopK(df(queryRows), df(corpusRows),
      "vec_id", "embedding", cb, k = 3)
      .collect().groupBy(_.getLong(0))
    out.keySet shouldBe Set(1L, 2L)
    out.values.foreach { rs =>
      rs.map(_.getInt(1)).sorted shouldBe Array(1, 2, 3)
      // sorted by (adc_d2, neighbor_id)
      val byRank = rs.sortBy(_.getInt(1)).map(r => (r.getLong(3), r.getLong(2)))
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
      }
    }
  }

  test("training and encode are deterministic across partitionings") {
    val d  = df(corpusRows)
    val c1 = ProductQuantizer.train(d, "vec_id", "embedding", dim, m, 2, 1)
    val c2 = ProductQuantizer.train(d.repartition(3), "vec_id", "embedding", dim, m, 2, 1)
    c1.books.map(_.map(c => (c.centId, c.qv.toSeq, c.n2))) shouldBe
      c2.books.map(_.map(c => (c.centId, c.qv.toSeq, c.n2)))
  }
}
