package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimensional data skipping — the
  * lakehouse `OPTIMIZE ZORDER BY` primitive (Delta/Iceberg), built from
  * Spark's own range partitioner.
  *
  * Sorting by an interleaved-bit key clusters rows that are close in EVERY
  * dimension into the same files, so parquet min/max footer stats prune
  * scans with predicates on ANY of the z-ordered columns — a single-column
  * sort only ever prunes its own column. At 100 TB this is the difference
  * between reading one file group and scanning the table for the
  * second-dimension predicate.
  *
  * The z-value is EXACT integer bit-interleaving (no doubles, no UDFs; a
  * flat `+` reduction of disjoint shifted bits that stays inside
  * whole-stage codegen), so layouts are deterministic and the mapping is
  * replayable in any engine.
  */
object ZOrder {

  /** Morton z-value: bit j of `cols(c)` lands at output bit `j*k + c`
    * (k = number of columns). Inputs must be NON-NEGATIVE and fit in
    * `bits` bits — values are masked to `bits` (callers rank/quantize
    * first; key domains beyond 2^bits alias into the same z-cells, which
    * degrades skipping but never correctness). `bits * k` must stay ≤ 63
    * so the key is a plain non-negative BIGINT.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"zvalue: need >= 2 columns to interleave, got $k")
    require(bits >= 1 && bits * k <= 63,
      s"zvalue: bits * cols must be in [$k, 63], got ${bits * k}")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      j       <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * k + ci)
    // disjoint bit positions → + is exactly bitwise OR
    terms.reduce(_ + _)
  }

  /** Write `df` z-ordered on `cols` into `numFiles` range-partitioned
    * parquet files: one range shuffle on the z-key, an in-partition sort,
    * no global sort barrier. Every file covers a compact z-range =
    * a tight min/max box in every interleaved dimension.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[Column],
      bits: Int,
      numFiles: Int,
      path: String
  ): Unit =
    df.withColumn("__z", zvalue(cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
}
