package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding merge training — the subword-tokenizer-training step
  * of an LLM data pipeline (Sennrich et al., ACL'16), Spark-first.
  *
  * Scale design: BPE statistics are a function of the WORD FREQUENCY
  * table, not the raw corpus — so the corpus is scanned ONCE (tokenize →
  * explode → count), and every merge round then runs on the compact
  * (word, count) table: ~10⁵–10⁷ distinct words regardless of corpus
  * size. Each round is one map-side-combined aggregation for the global
  * best pair (a single-row argmax collected to the driver — the merge
  * DECISION is inherently sequential in BPE) plus one narrow transform
  * applying the merge; `localCheckpoint` truncates the iterative lineage
  * every round, as in `ConnectedComponents`.
  *
  * Determinism: ties on pair count break lexicographically (left, then
  * right symbol), so the merge sequence is a pure function of the corpus —
  * identical across runs, partitionings, and cluster sizes.
  *
  * The merge-application step is a pure Column fold (`aggregate` with an
  * (acc, carry) struct accumulator): greedy left-to-right, merged symbols
  * don't re-merge within the round — standard BPE single-pass semantics.
  * No UDFs.
  *
  * Correctness gate: the merge table is checked against an independent
  * in-spec reference implementation (`BpeSpec`); the driver gate is
  * rows-only because the per-round global argmax is an iterative
  * algorithm, not expressible as one SQL query for the DuckDB oracle.
  */
object BpeTrainer {

  /** End-of-word marker, appended as a distinct final symbol so merges
    * never cross word boundaries and word-final units stay separable
    * (standard BPE practice).
    */
  val EndOfWord = "</w>"

  /** Character symbols of a word + the end-of-word marker. */
  private def wordSymbols(w: Column): Column =
    concat(filter(split(w, ""), s => s =!= ""), array(lit(EndOfWord)))

  /** Greedy left-to-right application of merge (a, b) → a+b over a symbol
    * array, as one Column expression (aggregate with an (acc, carry)
    * struct accumulator; the carry is the pending previous symbol).
    */
  private[curation] def applyMerge(sym: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("acc"), lit("").as("carry"))
    val step = (st: Column, x: Column) => {
      val acc   = st.getField("acc")
      val carry = st.getField("carry")
      when(carry === "", struct(acc.as("acc"), x.as("carry")))
        .when(carry === a && x === b,
          struct(concat(acc, array(lit(a + b))).as("acc"), lit("").as("carry")))
        .otherwise(
          struct(concat(acc, array(carry)).as("acc"), x.as("carry")))
    }
    val fin = (st: Column) => {
      val acc   = st.getField("acc")
      val carry = st.getField("carry")
      when(carry === "", acc).otherwise(concat(acc, array(carry)))
    }
    aggregate(sym, zero, step, fin)
  }

  /** One corpus scan → (word, n, sym) frequency table. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("sym", wordSymbols(col("word")))

  /** Train `numMerges` merges. Returns the ordered merge table:
    * (rank, left, right, merged, pair_count). Stops early (fewer rows)
    * when no adjacent pair occurs at least `minCount` times.
    */
  def trainBpe(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L
  ): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    var words = wordTable(df, textCol).select("n", "sym").localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank      = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // adjacent-pair counts weighted by word frequency; pos p (0-based,
      // over sym[1..len-1]) pairs sym[p+1] with sym[p+2] (1-based indexing)
      val top = words
        .select(col("n"), col("sym"),
          posexplode(slice(col("sym"), lit(1), size(col("sym")) - 1)))
        .select(col("n"), col("col").as("a"),
          element_at(col("sym"), col("pos") + 2).as("b"))
        .groupBy("a", "b")
        .agg(sum(col("n")).as("pn"))
        .orderBy(col("pn").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getAs[Long]("pn") < minCount) exhausted = true
      else {
        val a  = top.head.getAs[String]("a")
        val b  = top.head.getAs[String]("b")
        val pn = top.head.getAs[Long]("pn")
        merges += ((rank, a, b, a + b, pn))
        words = words
          .withColumn("sym", applyMerge(col("sym"), a, b))
          .localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Encode a text column with a trained merge list (applied in rank
    * order — the merge list is a small driver-side artifact, like a
    * broadcast vocabulary). Output column: flattened subword symbols of
    * all tokens. Expression depth grows with the merge count; intended
    * for the moderate merge tables this trainer produces.
    */
  def bpeEncode(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "bpe_symbols"
  ): DataFrame = {
    val encodeWord = (w: Column) =>
      merges.foldLeft(wordSymbols(w)) { case (sym, (a, b)) => applyMerge(sym, a, b) }
    df.withColumn(outCol, flatten(transform(tokens(col(textCol)), encodeWord)))
  }
}
