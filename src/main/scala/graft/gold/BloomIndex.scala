package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level Bloom-filter skipping index — the point-lookup complement of
  * [[StatsIndex]]'s min/max boxes. Min/max prunes RANGES and needs a
  * clustered layout (Z-order, range files) to be tight; a Bloom index
  * prunes EQUALITY probes on high-cardinality keys in any layout: each
  * file gets `kHashes` bit positions per value in a `bits`-bit space, and a
  * probe value can only live in files containing ALL of its positions —
  * Delta/Iceberg persist exactly this per data file, Parquet itself per
  * row group.
  *
  * Soundness is structural: lookup recomputes the SAME positions the build
  * inserted (same double-hashing expression), so a file holding the value
  * necessarily has every probed bit set — no false negative is possible;
  * false positives only cost I/O and die in the caller's row filter.
  * `BloomIndexSpec` property-checks pruned-read ≡ filtered-full-read over
  * present and absent probes and asserts real files get skipped.
  *
  * Scale shape: the build is one distributed scan — positions explode to
  * `kHashes` rows per input row, the per-file bitset is a map-side-combined
  * `collect_set` keyed on the file (index size: one row and ≤ `bits` ints
  * per file — metadata-scale, like every lakehouse manifest). Lookup
  * evaluates the probe's constant positions against the broadcast-sized
  * index and hands Spark an explicit file list, the same move a table
  * format's planner makes.
  */
object BloomIndex {

  /** The `kHashes` bit positions of `c` in a `bits`-bit filter: classic
    * double hashing `(b1 + i*step) mod bits` over two independent xxhash64
    * streams (seed chaining via an appended literal), with both hashes
    * reduced mod `bits` BEFORE combining — keeps every intermediate value
    * `< bits*(kHashes+1)`, so the arithmetic is overflow-free under ANSI
    * mode. `step` lands in `[1, bits-1]` so the probe sequence can't
    * degenerate to a single bit.
    */
  def bitPositions(c: Column, bits: Int, kHashes: Int): Column = {
    val b1 = pmod(xxhash64(c), lit(bits.toLong))
    val step = pmod(xxhash64(c, lit(0x9e3779b9L)), lit(bits.toLong - 1L)) + lit(1L)
    array((0 until kHashes).map(i =>
      pmod(b1 + lit(i.toLong) * step, lit(bits.toLong)).cast("int")): _*)
  }

  /** One row per parquet file under `path`: sorted distinct bit positions
    * of every `keyCol` value in the file, plus the row count. `bits` and
    * `k_hashes` ride along as columns so lookups can't probe with
    * mismatched parameters.
    */
  def build(
      spark: SparkSession,
      path: String,
      keyCol: String,
      bits: Int = 8192,
      kHashes: Int = 5
  ): DataFrame = {
    // bits >= 64, not just > 0: bits = 1 would make the double-hashing
    // step divisor (bits - 1) zero — a pmod-by-zero that under non-ANSI
    // sessions null-poisons positions and silently breaks the
    // no-false-negative guarantee. Anything under 64 bits is useless as a
    // filter anyway.
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"BloomIndex.build: bits must be a power of two >= 64, got $bits")
    require(kHashes >= 1, s"BloomIndex.build: kHashes must be >= 1, got $kHashes")
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        explode(bitPositions(col(keyCol), bits, kHashes)).as("bit"))
      .groupBy("file")
      .agg(sort_array(collect_set(col("bit"))).as("bit_set"),
        expr(s"count(1) DIV $kHashes").as("cnt"))
      .withColumn("bits", lit(bits))
      .withColumn("k_hashes", lit(kHashes))
  }

  /** Files that may contain `keyCol = value`: every probed bit present.
    * Parameters come from the index itself (stamped at build).
    */
  def pruneFiles(index: DataFrame, value: Column): Seq[String] = {
    val params = index.select("bits", "k_hashes").distinct().collect()
    require(params.length <= 1, "BloomIndex.pruneFiles: index mixes parameter sets")
    if (params.isEmpty) return Seq.empty
    val (bits, kHashes) = (params(0).getInt(0), params(0).getInt(1))
    val probe = bitPositions(value, bits, kHashes)
    index
      .filter(forall(probe, p => array_contains(col("bit_set"), p)))
      .select("file")
      .collect().map(_.getString(0)).toSeq
  }

  /** Read only the files that can contain `keyCol = value`. The caller
    * still applies the row-level equality — the index prunes I/O, never
    * semantics.
    */
  def prunedRead(spark: SparkSession, index: DataFrame, value: Column): DataFrame = {
    val files = pruneFiles(index, value)
    if (files.isEmpty) {
      val all = index.select("file").collect().map(_.getString(0))
      // An index over zero files carries no schema to return an empty frame
      // in — and spark.read.parquet() with an empty path list throws an
      // unrelated "unable to infer schema". Fail with the actual problem.
      require(all.nonEmpty,
        "BloomIndex.prunedRead: index is empty (built over a table with no " +
          "files) - there is no schema to produce an empty read for")
      spark.read.parquet(all.toIndexedSeq: _*).filter(lit(false))
    } else spark.read.parquet(files: _*)
  }
}
