package graft.similarity

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregator: keeps the k highest-scoring (score, id) pairs in
  * a bounded buffer.
  *
  * Why this exists when `row_number().over(window) <= k` works: the window
  * formulation SORTS every partition of the full scored set after a shuffle
  * of all of it. The aggregator reduces each map partition to ≤ k rows
  * BEFORE the shuffle (partial aggregation), so at 100 TB the exchange
  * carries `k × #partitions` rows instead of the whole cross product —
  * the difference between a shuffle measured in terabytes and one measured
  * in kilobytes.
  *
  * Buffer is a sorted Vector (k is small); ties break on id ascending so
  * results are deterministic and match the window formulation exactly.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      // Matches Spark's `ORDER BY score DESC, id` exactly, including NaN
      // placement: Double.compare treats NaN as greater than everything, so
      // NaN scores rank FIRST in descending order — same as the window
      // formulation (Ordering.by(-score) would have sorted NaN last).
      private def ord: Ordering[Scored] = new Ordering[Scored] {
        override def compare(x: Scored, y: Scored): Int = {
          val c = java.lang.Double.compare(y.score, x.score)
          if (c != 0) c else java.lang.Long.compare(x.id, y.id)
        }
      }

      override def zero: Seq[Scored] = Vector.empty

      override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
        (buf :+ x).sorted(ord).take(k)

      override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
        (a ++ b).sorted(ord).take(k)

      override def finish(buf: Seq[Scored]): Seq[Scored] = buf

      // kryo: the buffer is an opaque accumulator; k is tiny so the
      // serialized form is a few hundred bytes per group.
      override def bufferEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
      override def outputEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
    }

  /** Aggregate-based variant of CosineTopK.bruteForce: same output columns
    * and ordering semantics, shuffle reduced map-side to k rows/partition.
    */
  def bruteForceAgg(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val q = CosineTopK.prepareNonZero(queries, vecCol)
      .select(col(idCol).as("query_id"), col("qv").as("q_qv"), col("norm2").as("q_n2"))
    val c = CosineTopK.prepareNonZero(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qv").as("c_qv"), col("norm2").as("c_n2"))
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("dot", CosineTopK.dotQ(col("q_qv"), col("c_qv")))
      .withColumn("cosine", CosineTopK.cosine(col("dot"), col("q_n2"), col("c_n2")))
      .select(col("query_id"), col("neighbor_id").as("id"), col("cosine").as("score"))
      .as[(Long, Long, Double)]
      .map { case (qid, id, s) => (qid, Scored(id, s)) }
    val agg = topK(k).toColumn
    scored
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case (s, i) => (qid, i + 1, s.id, s.score) }
      }
      .toDF("query_id", "rank", "neighbor_id", "cosine")
  }
}
