package graft.core

import org.apache.spark.sql.DataFrame

/** Input-parallelism floor for per-row-heavy kernel stages (md5 shingling,
  * minhash signatures, BPE tokenization/encode): a corpus arriving as ONE
  * unsplittable scan partition (single parquet row group, gzip file, …)
  * runs the whole kernel stage on one core — the optimization guide's
  * input-skew case (§2.5: "repartition immediately after the read").
  *
  * Repartitions only when the PLANNED scan has fewer partitions than the
  * cluster's parallelism — at real scale inputs carry their own
  * parallelism and this is a no-op; on a small/badly-split input the
  * round-robin shuffle moves the raw rows once, before they fan out into
  * arrays several times their size. Row order changes; every caller is an
  * order-insensitive set/agg operator.
  */
object Spread {
  def smallScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.queryExecution.toRdd.getNumPartitions // planning only, no job
    if (parts >= target) df else df.repartition(target)
  }
}
