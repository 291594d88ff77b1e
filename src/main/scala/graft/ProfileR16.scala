package graft

import org.apache.spark.sql.functions._

/** Round-16 optimization scratch profiler: times the allpairs/LSH pipeline
  * stage by stage (guide §1 — measure first, noop sink). Not a declared
  * query; safe to remove.
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-profile",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_RAWFS")) {
      spark.sparkContext.hadoopConfiguration.set(
        "fs.AbstractFileSystem.file.impl", "org.apache.hadoop.fs.local.RawLocalFs")
      spark.sparkContext.hadoopConfiguration.set(
        "fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("stream")) { profileStream(spark, dir); spark.stop(); return }
    if (args.headOption.contains("lsh")) { profileLsh(spark, dir); spark.stop(); return }
    if (args.headOption.contains("canon")) { profileCanon(spark, dir); spark.stop(); return }
    if (args.headOption.contains("bpe")) { profileBpe(spark, dir); spark.stop(); return }
    if (args.headOption.contains("jobs")) { profileJobs(spark, dir, args(1)); spark.stop(); return }
    val docs = core.Tables(spark, dir).documents

    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // stage 0: shingling alone
    val shingled = dedup.NearDup.withHashedShingles(docs, "text", 3)
      .select(col("doc_id"), col("shingles"))
      .filter(size(col("shingles")) > 0)
      .persist()
    time("shingle+persist(count)") { shingled.count() }
    val stats = shingled.agg(count(lit(1)), sum(size(col("shingles"))),
      min(size(col("shingles"))), max(size(col("shingles")))).collect()(0)
    println(s"[profile] docs=${stats.getLong(0)} totalTokens=${stats.getLong(1)} " +
      s"minSz=${stats.getInt(2)} maxSz=${stats.getInt(3)}")

    val minJ = 0.65
    val num = math.floor(minJ * 10000).toLong
    val den = 10000L
    val tok = shingled.select(col("doc_id"), size(col("shingles")).as("sz"),
      explode(col("shingles")).as("t"))
    val dfreq = tok.groupBy("t").agg(count(lit(1)).as("tdf")).persist()
    time("dfreq count") { println(s"[profile] vocab=${dfreq.count()}") }
    val dfStats = dfreq.agg(sum(col("tdf")), max(col("tdf"))).collect()(0)
    println(s"[profile] sum(df)=${dfStats.getLong(0)} max(df)=${dfStats.getLong(1)}")

    val prefixed = tok.join(dfreq, "t")
      .groupBy("doc_id", "sz")
      .agg(array_sort(collect_list(struct(col("tdf"), col("t")))).as("ordered"))
      .withColumn("toks", transform(col("ordered"), s => s.getField("t")))
      .withColumn("probe_len",
        (col("sz") - floor((lit(num) * col("sz") + lit(den - 1L)) / lit(den)) + lit(1L)).cast("int"))
      .withColumn("index_len",
        (col("sz") - floor((lit(2L * num) * col("sz") + lit(den + num - 1L)) / lit(den + num)) + lit(1L)).cast("int"))
      .persist()
    time("prefixed count") { prefixed.count() }

    def postings(lenCol: String) = prefixed
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), col(lenCol))))
      .select(col("doc_id"), col("sz"), (col("pos") + lit(1)).as("pos"), col("col").as("pt"))
    val probe = postings("probe_len")
    val index = postings("index_len")
    time("probe postings count") { println(s"[profile] probeRows=${probe.count()}") }
    time("index postings count") { println(s"[profile] indexRows=${index.count()}") }

    def sizeRatioOk(szA: org.apache.spark.sql.Column, szB: org.apache.spark.sql.Column) =
      (szA.cast("long") * den >= szB.cast("long") * num) &&
        (szB.cast("long") * den >= szA.cast("long") * num)

    val joined = probe.as("y").join(index.as("x"),
      col("x.pt") === col("y.pt") &&
        (col("x.sz") < col("y.sz") ||
          (col("x.sz") === col("y.sz") && col("x.doc_id") < col("y.doc_id"))) &&
        sizeRatioOk(col("x.sz"), col("y.sz")))
    time("posting join row count") { println(s"[profile] joinRows=${joined.count()}") }

    val grouped = joined
      .groupBy(col("x.doc_id").as("id_x"), col("y.doc_id").as("id_y"),
        col("x.sz").as("szx"), col("y.sz").as("szy"))
      .agg(count(lit(1)).as("o_p"), max(col("x.pos")).as("pax"), max(col("y.pos")).as("pay"))
    time("pair groupBy count (pre pos-filter)") { println(s"[profile] pairGroups=${grouped.count()}") }

    val cands = grouped
      .filter(col("o_p") + least(col("szx") - col("pax"), col("szy") - col("pay")) >=
        floor((lit(num) * (col("szx") + col("szy")) + lit(den + num - 1L)) / lit(den + num)))
      .select(least(col("id_x"), col("id_y")).as("doc_a"),
        greatest(col("id_x"), col("id_y")).as("doc_b"))
    time("candidates after positional filter") { println(s"[profile] cands=${cands.count()}") }

    // full pipeline end to end for reference
    time("allPairsJaccard full") {
      dedup.NearDup.allPairsJaccard(docs, "doc_id", "text", minJaccard = 0.65)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }

  /** Per-job trace of one declared query: job id, duration, description. */
  private def profileJobs(spark: org.apache.spark.sql.SparkSession, dir: String,
      query: String): Unit = {
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        t0.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = t0.remove(e.jobId)
        if (s != null) done.add((e.jobId, System.nanoTime() - s._1, s._2))
      }
    })
    for (rep <- 1 to 2) {
      done.clear()
      val w0 = System.nanoTime()
      SparkEntry.queries(query)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      spark.catalog.clearCache()
      val jobs = done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
      println(f"[profile] $query rep$rep wall $wall%.2f s, ${jobs.length} jobs, " +
        f"job-time sum ${jobs.map(_._2).sum / 1e9}%.2f s")
      if (rep == 2) jobs.foreach { case (id, ns, desc) =>
        println(f"[job] $id%4d ${ns / 1e6}%8.1f ms  ${desc.take(110)}")
      }
    }
  }

  /** bpe_encode_trained attribution: word table, driver train, encode. */
  private def profileBpe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val corpus = core.Tables(spark, dir).orders.select(col("o_orderkey"),
      col("o_totalprice").cast("decimal(12,2)").cast("string").as("price_text"))
    // split trainBpeLocal into its two halves
    val words = time("wordTable collect") {
      graft.curation.BpeTrainer.wordTable(corpus, "price_text").select("word", "n")
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }
    println(s"[profile] words=${words.length}")
    val words2 = time("wordTable collect (warm)") {
      graft.curation.BpeTrainer.wordTable(corpus, "price_text").select("word", "n")
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }
    val merges = time("LocalBpe.train 1024 (driver only)") {
      graft.curation.LocalBpe.train(words2, 1024, 2L)
        .map(t => (t._2, t._3))
    }
    time("LocalBpe.train 1024 (driver, warm)") {
      graft.curation.LocalBpe.train(words2, 1024, 2L)
    }
    time("bpeEncodeTrained + checks noop") {
      graft.curation.BpeTrainer.bpeEncodeTrained(corpus, "price_text", merges)
        .select(col("o_orderkey"),
          length(col("price_text")).as("n_chars"),
          (concat_ws("", col("bpe_symbols")) ===
            concat(col("price_text"), lit("</w>"))).as("roundtrip_ok"),
          size(col("bpe_symbols")).between(1, length(col("price_text")) + 1)
            .as("n_symbols_ok"))
        .write.format("noop").mode("overwrite").save()
    }
    time("second full gate run") {
      SparkEntry.queries("q_x_bpe_encode_trained")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
  }

  /** dedup_canonical_quality attribution: clusters vs election. */
  private def profileCanon(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val docs = core.Tables(spark, dir).documents
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val clusters = time("dedupClusters lsh @0.8") {
      val c = dedup.NearDup.dedupClusters(docs, "doc_id", "text", minJaccard = 0.8)
      c.write.format("noop").mode("overwrite").save()
      c
    }
    time("electCanonicalBy") {
      dedup.NearDup.electCanonicalBy(clusters, "doc_id",
        docs.select(col("doc_id"), col("n_chars")), "n_chars")
        .write.format("noop").mode("overwrite").save()
    }
    time("full gate repeat (fresh)") {
      val c2 = dedup.NearDup.dedupClusters(docs, "doc_id", "text", minJaccard = 0.8)
      dedup.NearDup.electCanonicalBy(c2, "doc_id",
        docs.select(col("doc_id"), col("n_chars")), "n_chars")
        .write.format("noop").mode("overwrite").save()
    }
    // warm third pass, pairs vs clustering attribution
    val pairs = time("minhashLshPairs @0.8 (materialize)") {
      dedup.NearDup.minhashLshPairs(docs, "doc_id", "text", minJaccard = 0.8)
    }
    println(s"[profile] pairs=${pairs.count()}")
    time("clusterPairs (CC)") {
      dedup.NearDup.clusterPairs(pairs, "doc_a", "doc_b",
        docs.select(col("doc_id")), "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
  }

  /** LSH pipeline stage costs: shingle+sig, banding, candidate count,
    * verified-pair count, full run.
    */
  private def profileLsh(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.dedup.NearDup.{minhashSignature, bandKeys}
    val docs = core.Tables(spark, dir).documents
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val shingled = dedup.NearDup.withHashedShingles(docs, "text", 3)
      .select(col("doc_id"), col("shingles"))
      .withColumn("sig", minhashSignature(col("shingles")))
      .persist()
    time("shingle+sig count") { println(s"[profile] docs=${shingled.count()}") }
    val banded = shingled
      .select(col("doc_id"), posexplode(bandKeys(col("sig"), 4, 4)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    val oversized = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("__bcnt"))
      .filter(col("__bcnt") > dedup.NearDup.DefaultMaxBucketSize)
      .select("band_idx", "band_key")
    val sane = banded.join(oversized, Seq("band_idx", "band_key"), "left_anti")
    val candidates = sane.as("x")
      .join(sane.as("y"), Seq("band_idx", "band_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("raw candidate rows (pre-distinct)") { println(s"[profile] candRows=${candidates.count()}") }
    val dist = candidates.distinct()
    time("distinct candidates") { println(s"[profile] candDistinct=${dist.count()}") }
    time("minhashLshPairs full") {
      dedup.NearDup.minhashLshPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    shingled.unpersist()
  }

  /** Per-micro-batch duration attribution: run the windowed-agg replay
    * shape INLINE (same staging/trigger/sink as EventStream.replayWindowedAgg)
    * so we own the query handle, then dump each batch's durationMs.
    */
  private def profileStream(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val events = core.Tables(spark, dir).events
    val stagePath = "/tmp/graft_profile_stream"
    val staged = events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
    staged.repartitionByRange(6, col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(stagePath)
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 4)
    val stream = child.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagePath)
    val agg = stream
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
    val outPath = stagePath + "_out"
    val ckpt = stagePath + "_ckpt"
    Seq(outPath, ckpt).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    val t0 = System.nanoTime()
    val q = agg.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(outPath)
      }
      .start()
    try q.processAllAvailable() finally {
      println(f"[profile] stream total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      q.recentProgress.foreach(p => println("[progress] " + p.json))
      q.stop()
    }
  }
}
