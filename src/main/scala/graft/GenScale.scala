package graft

import org.apache.spark.sql.SparkSession

/** Scale-factor extrapolator for the driver testdata's STATISTICAL SHAPE —
  * generates `documents` / `embeddings` / `lineitem` at a size multiple of
  * the sf0.1 tables, preserving the properties that drive operator cost:
  *
  *  - documents: the 31-word uniform vocabulary (the corpus-density
  *    property that makes similarity work near-worst-case dense), 10–100
  *    word lengths, ~5% near-duplicate mutated copies at bounded distance,
  *    the lang/source mixes;
  *  - embeddings: 64-dim unit vectors in 10 isotropic clusters (the
  *    geometry kmeans/semdedup see);
  *  - lineitem: 4 lines/order, key domains scaled with the multiplier
  *    (co-purchase graph degree distribution preserved).
  *
  * Round 12 adds `events` (100k/mult over a FIXED 30-day window — density,
  * not span, grows with scale, which is what stresses streaming state) and
  * `orders` (unique dense o_orderkey — the CDF merge key), so the
  * streaming/txlog gate family can spot-close at sf1.
  *
  * Everything is a PURE FUNCTION of the row id (splitmix-scrambled
  * java.util.Random per row), so generation is distributed, deterministic,
  * and re-runnable. Used for the SCALING.md sf0.1→sf1 exponent
  * measurements and FOCUSED Verify+oracle spot-closures (self-contained
  * oracles recompute from the same parquet) — NOT a replacement for the
  * driver testdata in a FULL Verify run (fixture-based gates pin
  * driver-data row sets).
  *
  * Usage: `runMain graft.GenScale <outDir> [mult]` (default mult=10 ⇒ sf1).
  */
object GenScale {

  val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def scramble(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def freshText(id: Long): String = {
    val rnd = new java.util.Random(scramble(id))
    val n = 10 + rnd.nextInt(91)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb += ' '
      sb ++= Vocab(rnd.nextInt(Vocab.length))
      i += 1
    }
    sb.toString
  }

  /** ids ≡ 7 (mod 20) are mutated near-copies of id−7 (which is ≡ 0 mod
    * 20, never itself a copy — one-level dup structure, ~5% of the corpus,
    * the shape incremental dedup and clustering see).
    */
  def docText(id: Long): String =
    if (id % 20 == 7 && id >= 7) {
      val rnd = new java.util.Random(scramble(id * 31 + 11))
      freshText(id - 7).split(' ')
        .map(w => if (rnd.nextInt(20) == 0) Vocab(rnd.nextInt(Vocab.length)) else w)
        .mkString(" ")
    } else freshText(id)

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)
  final case class Li(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  // LocalDateTime ⇒ TIMESTAMP_NTZ in the written parquet — what
  // Tables.events expects and what DuckDB reads as naive TIMESTAMP
  final case class Ev(event_id: Long, ts: java.time.LocalDateTime,
      user_id: Long, event_type: String, value: Double, props: String)
  final case class Ord(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double,
      o_orderdate: java.time.LocalDateTime, o_orderpriority: String)
  final case class Cust(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: GenScale <outDir> [mult]"))
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = core.GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-genscale",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = 5000L * mult
    val nVecs = 2000L * mult
    val nLi = 600000L * mult
    val nParts = 20000L * mult
    val nSupps = 1000L * mult

    val langs = Array("en", "en", "en", "en", "en", "en", "en", "en",
      "de", "de", "de", "fr", "fr", "fr", "es", "es", "es", "zh", "zh", "zh")

    spark.range(nDocs).map { id =>
      val rnd = new java.util.Random(scramble(id * 7 + 3))
      val text = docText(id)
      Doc(id, text, langs(rnd.nextInt(langs.length)), s"src${id % 20}",
        text.length.toLong)
    }.coalesce(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // 10 isotropic unit-vector cluster centers (fixed seed), members =
    // normalize(center + 0.5·gauss) — the separation kmeans/IVF rely on
    val centers: Array[Array[Double]] = {
      val r = new java.util.Random(424242L)
      Array.fill(10) {
        val v = Array.fill(64)(r.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
    }
    spark.range(nVecs).map { id =>
      val rnd = new java.util.Random(scramble(id * 13 + 1))
      val label = rnd.nextInt(10)
      val c = centers(label)
      val v = Array.tabulate(64)(i => c(i) + 0.5 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      Emb(id, v.map(x => (x / n).toFloat), label)
    }.coalesce(4).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val flags = Array("R", "A", "N")
    val statuses = Array("F", "O")
    val baseTs = java.time.Instant.parse("1994-01-01T00:00:00Z").toEpochMilli
    spark.range(nLi).map { i =>
      val rnd = new java.util.Random(scramble(i * 17 + 9))
      val qty = 1 + rnd.nextInt(50)
      val price = (90000 + rnd.nextInt(910000)).toDouble / 100.0
      Li(i / 4,
        rnd.nextLong(nParts).abs,
        rnd.nextLong(nSupps).abs,
        (i % 4 + 1).toInt,
        qty.toDouble, price,
        rnd.nextInt(11).toDouble / 100.0,
        rnd.nextInt(9).toDouble / 100.0,
        flags(rnd.nextInt(3)), statuses(rnd.nextInt(2)),
        new java.sql.Timestamp(baseTs + rnd.nextInt(2500).toLong * 86400000L))
    }.repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // events: the streaming/txlog gates' input — the sf0.1 shape is 100k
    // rows over a FIXED 30-day window, 1.5k users, 5 uniform event types,
    // value 0..~560. The window stays fixed under scaling (density grows:
    // more events per session/window — the property that stresses the
    // streaming state), user domain scales with the multiplier.
    val nEvents = 100000L * mult
    val nUsers = 1500L * mult
    val types = Array("signup", "purchase", "view", "click", "error")
    val evBase = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
    spark.range(nEvents).map { i =>
      val rnd = new java.util.Random(scramble(i * 23 + 5))
      Ev(i,
        evBase.plusNanos(
          (rnd.nextDouble() * 30.0 * 86400e6).toLong * 1000L), // micros grid
        rnd.nextLong(nUsers).abs,
        types(rnd.nextInt(types.length)),
        rnd.nextInt(56022).toDouble / 100.0,
        s"""{"device":"d${rnd.nextInt(5)}","country":"c${rnd.nextInt(20)}"}""")
    }.repartition(16).write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // orders: the txlog gates' input — unique dense o_orderkey (the
    // natural key the CDF merge consumer folds on), custkey domain at
    // 1/10th of the keys, price 1k..500k
    val nOrders = 150000L * mult
    val priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    val ordBase = java.time.LocalDateTime.parse("1995-01-01T00:00:00")
    spark.range(nOrders).map { i =>
      val rnd = new java.util.Random(scramble(i * 29 + 11))
      Ord(i, rnd.nextLong(nOrders / 10).abs,
        if (rnd.nextBoolean()) "F" else "O",
        (100191L + rnd.nextInt(49899128)).toDouble / 100.0,
        ordBase.plusDays(rnd.nextInt(2400).toLong),
        priorities(rnd.nextInt(5)))
    }.repartition(16).write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    // customer: the static enrichment dim — key domain covers every
    // events.user_id (1500·mult users ⊂ 15000·mult customers, the sf0.1
    // coverage ratio), so stream-static joins keep their match profile
    val nCust = 15000L * mult
    val segments = Array("MACHINERY", "HOUSEHOLD", "BUILDING",
      "AUTOMOBILE", "FURNITURE")
    spark.range(nCust).map { i =>
      val rnd = new java.util.Random(scramble(i * 37 + 13))
      Cust(i, s"Customer#$i", rnd.nextInt(25),
        (rnd.nextInt(1099999) - 99999).toDouble / 100.0,
        segments(rnd.nextInt(5)))
    }.repartition(8).write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    println(s"[genscale] wrote documents=$nDocs embeddings=$nVecs " +
      s"lineitem=$nLi events=$nEvents orders=$nOrders customer=$nCust to $outDir")
    spark.stop()
  }
}
