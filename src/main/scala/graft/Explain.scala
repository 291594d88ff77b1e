package graft

/** Dev tool: dump formatted physical plans for selected queries to check
  * pushdown / broadcast / codegen shape. Usage: runMain graft.Explain [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // Same session shape as Bench/Verify (SPARK_GRAFT_CPUS) — explained
    // plans must match the plans the harness actually executes.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-explain",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional session-conf overrides (e.g. to explain a plan-choice knob's
    // OTHER branch): SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_a1_pricing_summary", "q_j1_enrich_defaults", "q_j3_sk_lookup",
      "q_w1_dedup_latest", "q_x_minhash_lsh", "q_x_cosine_topk",
      "q_x_novelty_score", "q_x_kmeans", "q_x_zorder_key")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
