package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.operators.AsOfJoin
import graft.similarity.{CosineTopK, TopKAggregator}

class OperatorsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join backward: greatest right ts <= left ts, inclusive, per key") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "k2", ts("2024-01-01 11:00:00"))
    ).toDF("lid", "k", "t")
    val right = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 100.0), // equal ts → inclusive match
      ("k1", ts("2024-01-01 11:30:00"), 200.0),
      ("k2", ts("2024-01-01 10:30:00"), 300.0)
    ).toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      Seq("v" -> "last_v"))
      .select("lid", "last_v").as[(Long, Option[Double])].collect().toMap
    out shouldBe Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> None, 4L -> Some(300.0))
  }

  test("as-of join forward: smallest right ts >= left ts, inclusive; tolerance nulls far matches") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")), // next right at 10:00 (equal → inclusive)
      (2L, "k1", ts("2024-01-01 10:30:00")), // next right at 11:30
      (3L, "k1", ts("2024-01-01 13:00:00")), // no future right row
      (4L, "k2", ts("2024-01-01 09:00:00"))  // next right 3h away — beyond tolerance
    ).toDF("lid", "k", "t")
    val right = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 100.0),
      ("k1", ts("2024-01-01 11:30:00"), 200.0),
      ("k2", ts("2024-01-01 12:00:00"), 300.0)
    ).toDF("k", "rt", "v")
    val plain = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
      Seq("v" -> "next_v"), direction = "forward")
      .select("lid", "next_v").as[(Long, Option[Double])].collect().toMap
    plain shouldBe Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> None, 4L -> Some(300.0))
    val tol = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
      Seq("v" -> "next_v"), direction = "forward",
      tolerance = Some(expr("INTERVAL 2 HOURS")))
      .select("lid", "next_v").as[(Long, Option[Double])].collect().toMap
    tol shouldBe Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> None, 4L -> None)
  }

  test("as-of join backward tolerance: stale matches are nulled, not replaced") {
    val left = Seq((1L, "k", ts("2024-01-02 10:00:00"))).toDF("lid", "k", "t")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "rt", "v")
    AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v" -> "last_v"),
      tolerance = Some(expr("INTERVAL 2 HOURS")))
      .select("last_v").as[Option[Double]].head() shouldBe None
    AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v" -> "last_v"),
      tolerance = Some(expr("INTERVAL 2 DAYS")))
      .select("last_v").as[Option[Double]].head() shouldBe Some(7.0)
  }

  test("top-k aggregator matches the window formulation exactly") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 4)
    val c = df.filter($"vec_id" >= 4)
    val a = CosineTopK.bruteForce(q, c, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = TopKAggregator.bruteForceAgg(q, c, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    a shouldBe b
    a.size shouldBe 20 // 4 queries × k
  }

  test("as-of join carries the matched right row atomically (no value mixing)") {
    // r2 has a null value column: the left row at ts 12:00 must get
    // (pid=2, value=null), NOT (pid=2, value=10.0) stitched from r1.
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00"))).toDF("lid", "k", "t")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), 1L, Some(10.0)),
      ("k", ts("2024-01-01 11:00:00"), 2L, None)
    ).toDF("k", "rt", "pid", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      Seq("pid" -> "m_pid", "v" -> "m_v"))
      .select("m_pid", "m_v").as[(Long, Option[Double])].head()
    out shouldBe ((2L, None))
  }

  test("batch sessionize: 30-minute gap sessions per user") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.operators.Sessionize
      .gapSessions(ev, Seq("user_id"), "ts", "30 MINUTE")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L))
  }

  test("optimizer rule rewrites size(array_intersect) on long arrays; values unchanged") {
    // spark.range: not a LocalRelation, so constant folding can't hide the
    // rewritten expression from the optimized plan
    val df = spark.range(2)
      .withColumn("a", sequence($"id" + 1, $"id" + 4)) // [1..4], [2..5]
      .withColumn("b", sequence($"id" + 3, $"id" + 5)) // [3..5], [4..6]
    val composed = df.select(
      org.apache.spark.sql.functions.size(array_intersect($"a", $"b")).as("n"))
    composed.queryExecution.optimizedPlan.toString.toLowerCase should
      include("intersectcount")
    composed.as[Int].collect().sorted shouldBe Array(2, 2)

    // direct function agrees with the composed form
    val direct = df.select(
      graft.plans.GraftExtensions.intersect_count($"a", $"b")).as[Int].collect()
    direct.sorted shouldBe Array(2, 2)

    // codegen path must actually COMPILE (a janino failure normally falls
    // back silently to the interpreted path and would hide a doGenCode bug)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val sortedIn = df.select(
        graft.plans.GraftExtensions.intersect_count(
          array_sort($"a"), array_sort($"b"), assumeSorted = true)).as[Int].collect()
      sortedIn.sorted shouldBe Array(2, 2)
      // duplicates count once (distinct-set semantics, both eval paths)
      val dup = df.select(graft.plans.GraftExtensions.intersect_count(
        concat($"a", $"a"), $"b")).as[Int].collect()
      dup.sorted shouldBe Array(2, 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("rolling hash and BPE tokens are deterministic with expected shapes") {
    val df = Seq("hello world42!", "").toDF("t")
    val out = df.select(
      graft.functions.TextFunctions.rollingHash($"t"),
      org.apache.spark.sql.functions.size(graft.functions.TextFunctions.bpeTokens($"t")))
      .as[(Long, Int)].collect()
    out(0)._1 should be > 0L
    out(0)._2 shouldBe 4 // hello | world | 42 | !
    out(1) shouldBe ((0L, 0))
    // fold check: "hi" = ((0*31+104)*31+105) % 1e9+7 = 3329
    Seq("hi").toDF("t").select(graft.functions.TextFunctions.rollingHash($"t"))
      .as[Long].head() shouldBe 3329L
  }

  test("salted join returns identical results to the plain join") {
    val rnd = new scala.util.Random(3)
    // skewed fact: 80% of rows share key 1
    val fact = (1 to 500).map(i =>
      (if (rnd.nextDouble() < 0.8) 1L else rnd.nextInt(20).toLong, s"row$i"))
      .toDF("k", "payload")
    val dim = (0L to 20L).map(k => (k, s"dim$k")).toDF("k", "dname")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "dname")
      .collect().toSet
    val salted = graft.operators.SkewJoin
      .saltedJoin(fact, dim, "k", saltFrom = Seq("payload"), n = 8)
      .select("k", "payload", "dname").collect().toSet
    salted shouldBe plain
  }

  test("native text-hash expressions match their composed formulations under forced codegen") {
    import graft.functions.TextFunctions
    import graft.dedup.NearDup
    // spark.range base: not a LocalRelation, so doGenCode actually runs;
    // texts cover empty, single-char, unicode (BMP), and long strings
    val df = spark.range(6).withColumn("t",
      element_at(array(lit(""), lit("a"), lit("hello world 42!"),
        lit("käse straße 日本"), lit("x" * 500),
        lit("the quick brown fox jumps over the lazy dog")), col("id").cast("int") + 1))
      .withColumn("toks", transform(TextFunctions.tokens(col("t")),
        x => TextFunctions.hexHash32(x)))
      .withColumn("sh", TextFunctions.hashedShingles(col("t"), 3))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = df.select(
        TextFunctions.rollingHash(col("t")).as("rh_n"),
        TextFunctions.rollingHashComposed(col("t")).as("rh_c"),
        TextFunctions.simhash32(col("toks")).as("sim_n"),
        TextFunctions.simhash32Composed(col("toks")).as("sim_c"),
        NearDup.minhashSignature(col("sh")).as("mh_n"),
        NearDup.minhashSignatureComposed(col("sh")).as("mh_c")
      ).collect()
      rows.foreach { r =>
        r.getLong(0) shouldBe r.getLong(1)
        r.getLong(2) shouldBe r.getLong(3)
        r.getSeq[Any](4) shouldBe r.getSeq[Any](5)
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("native quantized dot and LSH bucket match composed forms under forced codegen") {
    import graft.similarity.CosineTopK
    val rnd = new scala.util.Random(41)
    val df = spark.range(50).withColumn("v",
      transform(sequence(lit(1), lit(64)),
        i => ((i * 37 + col("id") * 13) % 2001 - 1000).cast("long")))
      .withColumn("w",
        transform(sequence(lit(1), lit(64)),
          i => ((i * 53 + col("id") * 7) % 2001 - 1000).cast("long")))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = df.select(
        CosineTopK.dotQ(col("v"), col("w")).as("d_n"),
        CosineTopK.dotQComposed(col("v"), col("w")).as("d_c"),
        CosineTopK.signLshBucket(col("v"), 6).as("b_n"),
        CosineTopK.signLshBucketComposed(col("v"), 6).as("b_c")
      ).collect()
      rows.foreach { r =>
        r.getLong(0) shouldBe r.getLong(1)
        r.getLong(2) shouldBe r.getLong(3)
      }
      // buckets must still spread (guards against a broken hyperplane hash)
      df.select(CosineTopK.signLshBucket(col("v"), 6)).distinct().count() should be > 4L
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("native FloatVecDot matches the functional formulation (interpreted + codegen)") {
    // interpreted path (LocalRelation gets constant-folded with eval())
    val local = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    local.select(VectorExpressions.float_dot($"a", $"b")).as[Double].head() shouldBe
      32.0 +- 1e-9
    local.select(VectorExpressions.float_cosine($"a", $"a")).as[Double].head() shouldBe
      1.0 +- 1e-12

    // codegen path: spark.range is NOT a LocalRelation, so the optimizer
    // can't pre-evaluate and doGenCode actually runs
    val df = spark.range(3)
      .withColumn("a", transform(sequence(lit(1), lit(4)),
        i => (i + col("id")).cast("float")))
      .withColumn("b", transform(sequence(lit(1), lit(4)),
        i => (i * 2 - col("id") * 3).cast("float"))) // goes negative for id≥1
    val native = df.select(VectorExpressions.float_dot($"a", $"b")).as[Double].collect()
    val functional = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).as[Double].collect()
    native shouldBe functional
  }

  test("SnapshotDiff classifies insert/delete/update incl. null transitions; after-image wins") {
    val before = Seq(
      (1L, Some("a"), 10L),  // unchanged
      (2L, Some("b"), 20L),  // value update
      (3L, None, 30L),       // null→value update
      (4L, Some("d"), 40L),  // value→null update
      (5L, Some("e"), 50L)   // delete
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("B"), 20L),
      (3L, Some("c"), 30L),
      (4L, None, 40L),
      (6L, Some("f"), 60L)   // insert
    ).toDF("k", "s", "v")
    val out = graft.operators.SnapshotDiff
      .diff(before, after, Seq("k"), Seq("s", "v"))
      .select("k", "s", "change_type")
      .as[(Long, Option[String], String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out shouldBe Map(
      2L -> ((Some("B"), "update")),  // after-image survives
      3L -> ((Some("c"), "update")),
      4L -> ((None, "update")),
      5L -> ((Some("e"), "delete")),  // before-image for deletes
      6L -> ((Some("f"), "insert")))
    // includeUnchanged restores the full key universe
    graft.operators.SnapshotDiff.diff(before, after, Seq("k"), Seq("s", "v"),
      includeUnchanged = true).count() shouldBe 6
  }

  test("applyDiff round-trips: applying diff(before, after) to before reconstructs after") {
    val before = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L),
      (4L, Some("d"), 40L), (5L, Some("e"), 50L)
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), 10L), (2L, Some("B"), 20L), (3L, Some("c"), 30L),
      (4L, None, 40L), (6L, Some("f"), 60L)
    ).toDF("k", "s", "v")
    val delta = graft.operators.SnapshotDiff.diff(before, after, Seq("k"), Seq("s", "v"))
    val rebuilt = graft.operators.SnapshotDiff.applyDiff(before, delta, Seq("k"))
      .as[(Long, Option[String], Long)].collect().toSet
    rebuilt shouldBe after.as[(Long, Option[String], Long)].collect().toSet
    // empty diff is the identity
    val noop = graft.operators.SnapshotDiff.diff(before, before, Seq("k"), Seq("s", "v"))
    graft.operators.SnapshotDiff.applyDiff(before, noop, Seq("k"))
      .as[(Long, Option[String], Long)].collect().toSet shouldBe
      before.as[(Long, Option[String], Long)].collect().toSet
  }

  test("topKPerGroup matches the window formulation and compiles to WindowGroupLimit") {
    val df = (1 to 300).map(i => (s"g${i % 5}", i.toLong, i * 7 % 97)).toDF("g", "id", "score")
    val ordering = Seq(col("score").desc, col("id"))
    val got = graft.operators.GroupTopK.topKPerGroup(df, Seq("g"), ordering, k = 4)
    val expected = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("rn", row_number().over(Window.partitionBy("g").orderBy(ordering: _*)))
        .filter($"rn" <= 4).drop("rn")
    }
    got.as[(String, Long, Int)].collect().toSet shouldBe
      expected.as[(String, Long, Int)].collect().toSet
    got.groupBy("g").count().filter($"count" =!= 4).count() shouldBe 0
    // scale shape: map-side per-group limit BEFORE the shuffle
    got.queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  test("SnapshotDiff/applyDiff treat a NULL key as a matchable PK value") {
    val before = Seq((Some(1L), "a"), (None, "x")).toDF("k", "s")
    val after  = Seq((Some(1L), "a"), (None, "y")).toDF("k", "s")
    val delta = graft.operators.SnapshotDiff.diff(before, after, Seq("k"), Seq("s"))
    // NULL-key row reads as ONE update, not a spurious delete+insert pair
    delta.select("k", "s", "change_type").as[(Option[Long], String, String)]
      .collect() shouldBe Array((None, "y", "update"))
    graft.operators.SnapshotDiff.applyDiff(before, delta, Seq("k"))
      .as[(Option[Long], String)].collect().toSet shouldBe
      after.as[(Option[Long], String)].collect().toSet
  }

  test("IncrementalAgg keeps an all-NULL sum NULL: 'no data' stays distinct from 'zero total'") {
    val stored = Seq(("g1", Some(5L)), ("g2", Option.empty[Long])).toDF("g", "total")
    val delta  = Seq(("g1", Some(2L))).toDF("g", "total")
    val merged = graft.operators.IncrementalAgg
      .mergeAdditive(stored, delta, Seq("g"), sums = Seq("total"))
      .as[(String, Option[Long])].collect().toMap
    merged shouldBe Map("g1" -> Some(7L), "g2" -> None)
  }

  test("IncrementalAgg merge of split partials equals the full recompute") {
    val rows = (1 to 500).map(i => (i % 37, i.toLong, i % 13))
      .toDF("g", "v", "m")
    def aggOf(df: org.apache.spark.sql.DataFrame) = df.groupBy("g").agg(
      count(lit(1)).as("cnt"), sum($"v").as("total"),
      min($"m").as("lo"), max($"m").as("hi"))
    val full = aggOf(rows).as[(Int, Long, Long, Int, Int)].collect().toSet
    // split so some groups exist in only one part (disjoint-key path)
    val merged = graft.operators.IncrementalAgg.mergeAdditive(
      aggOf(rows.filter($"v" <= 100)), aggOf(rows.filter($"v" > 100)),
      keys = Seq("g"), sums = Seq("cnt", "total"), mins = Seq("lo"), maxs = Seq("hi"))
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    merged shouldBe full
  }

  test("IncrementalAgg merges a NULL-keyed group instead of splitting it") {
    val stored = Seq((Option(1L), 10L), (Option.empty[Long], 3L)).toDF("g", "total")
    val delta  = Seq((Option(1L), 5L), (Option.empty[Long], 4L)).toDF("g", "total")
    val merged = graft.operators.IncrementalAgg
      .mergeAdditive(stored, delta, Seq("g"), sums = Seq("total"))
      .as[(Option[Long], Long)].collect().toMap
    merged shouldBe Map(Option(1L) -> 15L, None -> 7L)
  }

  test("range join: point-in-interval equals the naive range predicate, once per pair") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextInt(2001) - 1000L))
      .toDF("pid", "x")
    val ivs = (0 until 80).map { i =>
      val lo = rnd.nextInt(2001) - 1050L
      (i.toLong, lo, lo + rnd.nextInt(120))
    }.toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin.pointInInterval(
      pts, ivs, "x", "lo", "hi", bucketWidth = 64L)
    val gotPairs = got.select("pid", "iid").as[(Long, Long)].collect()
    val want = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect()
    // multiset equality ⇒ identical matches AND exactly-once emission
    gotPairs.sorted.toSeq shouldBe want.sorted.toSeq
    want.length should be > 100 // the fixture actually exercises overlap
    val plan = got.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("range join: exact bucketing at magnitudes beyond double precision") {
    val big = 1L << 62
    val pts = Seq((1L, big + 1), (2L, big + 9), (3L, big - 1)).toDF("pid", "x")
    val ivs = Seq((10L, big, big + 8)).toDF("iid", "lo", "hi")
    graft.operators.RangeJoin
      .pointInInterval(pts, ivs, "x", "lo", "hi", bucketWidth = 7L)
      .select("pid").as[Long].collect().toSet shouldBe Set(1L)
  }

  test("interval overlap: equals the naive overlap predicate, keyed, once per pair") {
    val rnd = new scala.util.Random(23)
    def mk(tag: String) = (0 until 120).map { i =>
      val lo = rnd.nextInt(1000) - 500L
      (i.toLong, s"g${rnd.nextInt(3)}", lo, lo + rnd.nextInt(90))
    }.toDF(s"id_$tag", "g", s"lo_$tag", s"hi_$tag")
    val l = mk("l")
    val r = mk("r")
    val got = graft.operators.RangeJoin.intervalOverlap(
      l, r, "lo_l", "hi_l", "lo_r", "hi_r", bucketWidth = 48L, keys = Seq("g"))
      .select("id_l", "id_r").as[(Long, Long)].collect()
    val want = l.join(r, Seq("g"))
      .filter($"lo_l" <= $"hi_r" && $"lo_r" <= $"hi_l")
      .select("id_l", "id_r").as[(Long, Long)].collect()
    got.sorted.toSeq shouldBe want.sorted.toSeq
    want.length should be > 300
  }

  test("interval overlap: touching endpoints count, keyless side works") {
    val a = Seq((1L, 0L, 10L)).toDF("ida", "loa", "hia")
    val b = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("idb", "lob", "hib")
    graft.operators.RangeJoin
      .intervalOverlap(a, b, "loa", "hia", "lob", "hib", bucketWidth = 5L)
      .select("idb").as[Long].collect().toSet shouldBe Set(2L)
  }

  test("range join: inverted intervals (lo > hi) are empty, not descending explosions") {
    val pts = Seq((1L, 5L)).toDF("pid", "x")
    // lo > hi by a billion: a descending sequence would blow past the
    // span guard (negative span) and explode ~10^8 buckets
    val ivs = Seq((1L, 1000000000L, 0L), (2L, 0L, 10L)).toDF("iid", "lo", "hi")
    graft.operators.RangeJoin
      .pointInInterval(pts, ivs, "x", "lo", "hi", bucketWidth = 10L)
      .select("iid").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  test("range join: oversized interval fails loudly instead of exploding") {
    val pts = Seq((1L, 5L)).toDF("pid", "x")
    val ivs = Seq((1L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      graft.operators.RangeJoin.pointInInterval(
        pts, ivs, "x", "lo", "hi", bucketWidth = 10L,
        maxBucketsPerInterval = 100).collect()
    }
    ex.getMessage should include("RangeJoin")
  }

  test("range join: colliding non-key column names are rejected") {
    an[IllegalArgumentException] should be thrownBy
      graft.operators.RangeJoin.pointInInterval(
        Seq((1L, 2L)).toDF("a", "x"),
        Seq((1L, 0L, 5L)).toDF("a", "lo", "hi"), "x", "lo", "hi", 10L)
  }

  test("exactHeavyHitters equals the exact GROUP BY, independent of partitioning") {
    import graft.operators.HeavyHitters
    // 1000 rows: key 1 -> 300, key 2 -> 150, keys 3..552 -> 1 each
    val rows = Seq.fill(300)(1L) ++ Seq.fill(150)(2L) ++ (3L to 552L)
    val expected = Map(1L -> 300L, 2L -> 150L) // k = 8: threshold n/k = 125
    for (parts <- Seq(1, 3, 13)) {
      val df = spark.createDataset(rows)(org.apache.spark.sql.Encoders.scalaLong)
        .repartition(parts).toDF("k")
      val got = HeavyHitters.exactHeavyHitters(df, "k", 8)
        .select("k", "cnt").as[(Long, Long)].collect().toMap
      got shouldBe expected
    }
  }

  test("exactHeavyHitters: strict threshold and empty result on uniform data") {
    import graft.operators.HeavyHitters
    // key exactly AT n/k is NOT a heavy hitter (strict >)
    val atThreshold = Seq.fill(25)(1L) ++ (100L until 175L) // n=100, k=4 -> n/k=25
    val df1 = atThreshold.toDF("k")
    HeavyHitters.exactHeavyHitters(df1, "k", 4).count() shouldBe 0L
    // uniform data beyond sketch resolution: empty, not an error
    val uniform = (1L to 500L).toDF("k")
    HeavyHitters.exactHeavyHitters(uniform, "k", 10).count() shouldBe 0L
    // n_total rides along
    val df2 = (Seq.fill(60)(7L) ++ (101L to 140L)).toDF("k")
    val r = HeavyHitters.exactHeavyHitters(df2, "k", 2)
      .select("k", "cnt", "n_total").as[(Long, Long, Long)].collect()
    r shouldBe Array((7L, 60L, 100L))
  }

  test("floor PageRank matches the hand computation; mass never grows") {
    import graft.operators.PageRank
    // nodes {1,2,3}; 1→2, 1→3, 2→3; scale 300 → base 100; damping 0.5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r1 = PageRank.ranks(edges, iterations = 1,
      dampingPpm = 500000L, scale = 300L)
      .as[(Long, Long)].collect().toMap
    // in-sums: 0 / 50 / (50+100); r' = (0.5·100 + 0.5·inSum) floored
    r1 shouldBe Map(1L -> 50L, 2L -> 75L, 3L -> 125L)
    val r2 = PageRank.ranks(edges, iterations = 2,
      dampingPpm = 500000L, scale = 300L)
      .as[(Long, Long)].collect().toMap
    // iter2 in-sums: 0 / 25 / (25+75); node2: (50M+12.5M)÷1M floors to 62
    r2 shouldBe Map(1L -> 50L, 2L -> 62L, 3L -> 100L)
    // floor divisions only ever DROP mass (dangling node 3 + remainders)
    r2.values.sum should be <= 300L
  }

  test("heavyHittersPerGroup: dominant key per group with exact group shares") {
    import graft.operators.HeavyHitters
    val rows = Seq.fill(80)(("a", 1L)) ++ Seq.fill(20)(("a", 2L)) ++
      Seq.fill(30)(("b", 2L)) ++ (1L to 10L).map(i => ("b", 100L + i))
    val df = rows.toDF("g", "k").repartition(5)
    val got = HeavyHitters.heavyHittersPerGroup(df, "g", "k", 3)
      .select("g", "k", "cnt", "n_group").as[(String, Long, Long, Long)]
      .collect().toSet
    // group a (n=100, n/3=33.3): key 1 (80) qualifies, key 2 (20) does not
    // group b (n=40, n/3=13.3): key 2 (30) qualifies
    got shouldBe Set(("a", 1L, 80L, 100L), ("b", 2L, 30L, 40L))
  }
}
