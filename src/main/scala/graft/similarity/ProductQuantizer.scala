package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import CosineTopK.{dotQ, quantize}

/** Product quantization for ANN at memory scales where even quantized full
  * vectors don't fit: split each dim-D vector into `m` subspaces, train a
  * small codebook per subspace (the exact quantized Lloyd from [[KMeans]]),
  * and represent every corpus vector by `m` small codeword positions — a
  * D-float embedding becomes m bytes-ish of codes. Queries score corpus
  * rows with ADC (asymmetric distance computation): per query, one exact
  * distance table per subspace against that subspace's codebook, then a
  * candidate's approximate distance is the sum of m table lookups
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public literature).
  *
  * Exact integer arithmetic end-to-end (the [[KMeans]] grid): training,
  * codes, distance tables, and ADC sums are all BIGINT-exact, so the whole
  * pipeline — m Lloyd trainings, encode, ADC top-k — replays in DuckDB
  * CTEs (`q_x_pq_adc`).
  *
  * Scale shape:
  *  - training cost = m Lloyd runs on dim/m-wide slices (same shuffle
  *    profile as [[KMeans.train]], narrower rows);
  *  - encode is a SHUFFLE-FREE projection (`least()` over ksub codeword
  *    literals per subspace — whole-stage codegen, like KMeans assignment);
  *  - ADC scan: the query batch carries its distance tables as array
  *    columns and broadcasts; per corpus row the score is m `element_at`
  *    lookups + adds — no per-pair dot products, which is the whole point
  *    at 100 TB corpus scale.
  */
object ProductQuantizer {

  /** Trained per-subspace codebooks. `books(i)` is subspace i's codeword
    * table sorted by stable centroid id; codes are 1-based POSITIONS into
    * that order (positions, not raw centroid ids, so ADC tables index with
    * `element_at` directly).
    */
  final case class Codebooks(m: Int, dsub: Int, books: Seq[Seq[KMeans.QCentroid]])

  /** Train `m` codebooks of `ksub` codewords each over the corpus. `dim`
    * must be divisible by `m`; every corpus vector must have `dim`
    * components.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int
  ): Codebooks = {
    require(m >= 1 && dim % m == 0, s"pq: dim $dim must be divisible by m $m")
    val dsub = dim / m
    val books = (0 until m).map { i =>
      KMeans.train(
        corpus.select(col(idCol),
          slice(col(vecCol), i * dsub + 1, dsub).as("__pq_sub")),
        idCol, "__pq_sub", ksub, iters)
    }
    Codebooks(m, dsub, books)
  }

  /** 1-based position of the nearest codeword — argmin with the same
    * (dist2, order) tiebreak as Lloyd assignment (positions are in stable
    * centroid-id order, so the tiebreak is id-equivalent).
    */
  private def bestPos(book: Seq[KMeans.QCentroid], sub: Column, subN2: Column): Column = {
    val cands = book.zipWithIndex.map { case (c, i) =>
      struct(
        (lit(c.n2) + subN2 - lit(2L) * dotQ(sub, typedLit(c.qv))).as("dist2"),
        lit(i + 1).as("pos"))
    }
    (if (cands.size == 1) cands.head else least(cands: _*)).getField("pos")
  }

  /** Encode every row as m codeword positions: (idCol, code_0..code_{m-1}).
    * Pure projection — the persistable PQ index.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame = {
    val q = df.select(col(idCol), quantize(col(vecCol)).as("__pq_qv"))
    val codes = cb.books.zipWithIndex.map { case (book, i) =>
      val sub = slice(col("__pq_qv"), i * cb.dsub + 1, cb.dsub)
      bestPos(book, sub, dotQ(sub, sub)).as(s"code_$i")
    }
    q.select(col(idCol) +: codes: _*)
  }

  /** ADC top-k: every query row computes one exact distance table per
    * subspace (ksub entries each), broadcasts, and scores each corpus code
    * row with m array lookups. Output: (query_id, rank, neighbor_id,
    * adc_d2) with a total (adc_d2, neighbor_id) ordering.
    */
  def adcTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      k: Int
  ): DataFrame = {
    val codes = encode(corpus, idCol, vecCol, cb)
      .withColumnRenamed(idCol, "neighbor_id")
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      quantize(col(vecCol)).as("__pq_qv"))
    val tables = cb.books.zipWithIndex.map { case (book, i) =>
      val sub   = slice(col("__pq_qv"), i * cb.dsub + 1, cb.dsub)
      val subN2 = dotQ(sub, sub)
      array(book.map(c =>
        lit(c.n2) + subN2 - lit(2L) * dotQ(sub, typedLit(c.qv))): _*).as(s"__pq_t$i")
    }
    val qt  = q.select(col("query_id") +: tables: _*)
    val adc = (0 until cb.m)
      .map(i => element_at(col(s"__pq_t$i"), col(s"code_$i")))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("adc_d2").asc, col("neighbor_id"))
    codes.crossJoin(broadcast(qt))
      .withColumn("adc_d2", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_d2")
  }
}
