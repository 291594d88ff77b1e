package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable broadcast Bloom-filter prefilter for semi/anti joins — the
  * 100 TB pattern where the build side's key set is too large to broadcast
  * exactly, but its Bloom bitset (a few MB for hundreds of millions of
  * keys) is not. Results are EXACT: the filter has no false negatives, and
  * an exact join resolves the false positives — only the `might-match`
  * survivors ever reach the shuffle. (Spark's injected runtime bloom
  * filters are per-query and planner-gated; this operator makes the bitset
  * a first-class, persistable artifact that can be built once and reused
  * across batches, like the minhash signature store.)
  *
  * Deterministic by construction (seeded xxhash64, no JVM hashing), so the
  * composed joins are oracle-checkable: `q_o_bloom_semi` /
  * `q_o_bloom_anti` compare against plain EXISTS / NOT EXISTS in DuckDB.
  *
  * Plan shape: the build is one explode(k positions) + bit_or shuffle of
  * at most `numBits/64` groups; the dense-array scatter runs on a single
  * row. The probe side crossJoins the one-row bitset (broadcast — the J7
  * scalar-stats pattern) and evaluates k codegen'd bit tests per row
  * (element_at + shiftleft + bitwiseAND — no HOF lambdas, so the filter
  * stays inside whole-stage codegen).
  */
object BloomPrefilter {

  /** Bit positions of `key` for each of `numHashes` seeded hash functions. */
  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      pmod(xxhash64(lit(i), key), lit(numBits.toLong)).cast("int"))

  /** Build the bitset over a key column: a single-row DataFrame
    * `(n_bits, n_hashes, words: array<long>)`, suitable for writing to
    * parquet and reusing across batches. NULL keys set no bits (a NULL key
    * never equi-joins, so it has no membership to encode).
    */
  def build(keys: DataFrame, key: Column, numBits: Int, numHashes: Int): DataFrame = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
    require(numHashes > 0, s"numHashes must be positive: $numHashes")
    val numWords = numBits / 64
    keys
      .select(explode(array(positions(key, numBits, numHashes): _*)).as("p"))
      .filter(col("p").isNotNull)
      .select(
        floor(col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64)).cast("int")).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("wm"))
      .select(
        lit(numBits).as("n_bits"),
        lit(numHashes).as("n_hashes"),
        transform(sequence(lit(0), lit(numWords - 1)),
          i => coalesce(element_at(col("wm"), i.cast("int")), lit(0L))).as("words"))
  }

  /** k-bit membership test against a `words` array column. NULL key → NULL
    * (three-valued, like an equi-join predicate on a NULL key).
    */
  private def mightContain(words: Column, key: Column, numBits: Int, numHashes: Int): Column =
    positions(key, numBits, numHashes).map { p =>
      element_at(words, (floor(p / 64) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64)).cast("int"))) =!= 0
    }.reduce(_ && _)

  /** Keep only left rows that MIGHT have a match in the bloom (false
    * positives possible, false negatives impossible). `bloom` is a
    * `build(...)` output (fresh or re-read from storage).
    */
  def prefilter(left: DataFrame, leftKey: Column, bloom: DataFrame,
      numBits: Int, numHashes: Int): DataFrame =
    left.crossJoin(broadcast(bloom.select(col("words").as("__bf_words"))))
      .filter(mightContain(col("__bf_words"), leftKey, numBits, numHashes))
      .drop("__bf_words")

  /** Exact left-semi join with a bloom pre-prune of the probe side. Column
    * names of `left` and `right` must be disjoint.
    */
  def semiJoin(left: DataFrame, leftKey: Column, right: DataFrame, rightKey: Column,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = build(right.select(rightKey), rightKey, numBits, numHashes)
    prefilter(left, leftKey, bloom, numBits, numHashes)
      .join(right, leftKey === rightKey, "left_semi")
  }

  /** Exact left-anti join where bloom-definite non-members bypass the join
    * entirely — only might-members shuffle into the exact anti join.
    * NULL-key left rows match nothing, so they pass through (anti-join
    * semantics), routed around the three-valued membership test.
    */
  def antiJoin(left: DataFrame, leftKey: Column, right: DataFrame, rightKey: Column,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = build(right.select(rightKey), rightKey, numBits, numHashes)
    val withB = left.crossJoin(broadcast(bloom.select(col("words").as("__bf_words"))))
    val mc    = mightContain(col("__bf_words"), leftKey, numBits, numHashes)
    val definiteNo = withB.filter(leftKey.isNull || !mc).drop("__bf_words")
    val maybe = withB.filter(mc).drop("__bf_words")
      .join(right, leftKey === rightKey, "left_anti")
    definiteNo.unionByName(maybe)
  }
}
