package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gold.{DimStore, InMemoryMergeDimStore, ParquetMergeDimStore, RewriteDimStore, Scd2, TxLog, TxLogDimStore}

/** The SCD2 storage seam's contract: the portable full-rewrite publish and
  * the `MERGE INTO`-shaped row-operation publish must produce IDENTICAL
  * dimension states over any change sequence — that is what makes a
  * lakehouse MERGE target a drop-in behind the format flag. Also pins the
  * O(batch) bound motivating the seam: the merge path touches rows
  * proportional to the batch's keys, not the dimension.
  */
class Scd2MergeSeamSpec extends SparkSpecBase {
  import spark.implicits._

  private val nk = Seq("user_id")
  private val attrs = Seq("email", "tier")

  private def batchDf(rows: Seq[(Long, String, String, String)]): DataFrame =
    rows.toDF("user_id", "ts", "email", "tier")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  /** Deterministic pseudo-random change sequence: batches of upserts over
    * a small key space so updates, new keys, new versions, and no-op
    * duplicate states all occur.
    */
  private def randomBatches(seed: Long, nBatches: Int): Seq[DataFrame] = {
    val rnd = new scala.util.Random(seed)
    (0 until nBatches).map { b =>
      val rows = (0 until (3 + rnd.nextInt(5))).map { i =>
        val id = 1L + rnd.nextInt(8)
        // ts unique per batch row (hour = row index): a batch must not
        // carry two states of one key at the SAME timestamp — (nk, ts) is
        // the version primary key in both publish paths
        val ts = f"2024-01-${b + 1}%02d 0$i:00:00"
        val email = s"u$id@${rnd.nextInt(3)}.example"
        val tier = Seq("free", "pro", "max")(rnd.nextInt(3))
        (id, ts, email, tier)
      }.distinct
      batchDf(rows)
    }
  }

  private def sortedState(df: DataFrame): Seq[Seq[Any]] =
    df.select("user_id", "effective_start_ts", "effective_end_ts",
        "is_current", "email", "tier")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("merge-store publish equals rewrite publish over random change sequences") {
    for (seed <- Seq(7L, 23L, 99L)) {
      val batches = randomBatches(seed, 5)
      val initial = Scd2.initialLoad(batches.head, nk, "ts", attrs,
        tiebreak = Seq("email", "tier"))

      val mergeStore = new InMemoryMergeDimStore(spark, initial.schema)
      mergeStore.init(initial)
      var rewriteState = initial

      batches.tail.foreach { batch =>
        val delta = Scd2.incrementalDelta(rewriteState, batch, nk, "ts",
          attrs, tiebreak = Seq("email", "tier"))
        // O(batch) bound inputs, captured BEFORE the state advances
        val oldTouchedVersions =
          rewriteState.join(delta.touchedKeys, nk, "left_semi").count()
        mergeStore.publish(delta, nk, "effective_start_ts")
        rewriteState = Scd2.incrementalMerge(rewriteState, batch, nk, "ts",
          attrs, tiebreak = Seq("email", "tier"))

        withClue(s"seed=$seed: ") {
          sortedState(mergeStore.read()) shouldBe sortedState(rewriteState)
          // the merge path touches O(batch) rows: every touched row is an
          // upsert (update-or-insert) or a collapsed old version (delete)
          // of a TOUCHED key — never a row of an untouched key
          val upserts = delta.upserts.count()
          mergeStore.lastTouchedRows should be <= (upserts + oldTouchedVersions)
        }
      }
      // SCD2 invariants hold in the merged state: exactly one current row
      // per key, intervals contiguous
      val state = mergeStore.read()
      val perKey = state.groupBy("user_id")
        .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
        .collect()
      perKey.foreach(_.getLong(1) shouldBe 1L)
    }
  }

  test("parquet-merge store equals rewrite over random sequences, O(batch) bound distributed") {
    for (seed <- Seq(11L, 57L)) {
      val dir = java.nio.file.Files.createTempDirectory("dimstore-merge")
        .toString + "/dim"
      val batches = randomBatches(seed, 5)
      val initial = Scd2.initialLoad(batches.head, nk, "ts", attrs,
        tiebreak = Seq("email", "tier"))
      val store = new ParquetMergeDimStore(spark, dir)
      store.init(initial)
      var rewriteState = initial
      batches.tail.foreach { batch =>
        val delta = Scd2.incrementalDelta(rewriteState, batch, nk, "ts",
          attrs, tiebreak = Seq("email", "tier"))
        val oldTouchedVersions =
          rewriteState.join(delta.touchedKeys, nk, "left_semi").count()
        store.publish(delta, nk, "effective_start_ts")
        rewriteState = Scd2.incrementalMerge(rewriteState, batch, nk, "ts",
          attrs, tiebreak = Seq("email", "tier"))
        withClue(s"seed=$seed: ") {
          sortedState(store.read()) shouldBe sortedState(rewriteState)
          val upserts = delta.upserts.count()
          store.lastTouchedRows should be <= (upserts + oldTouchedVersions)
        }
      }
    }
  }

  test("txlog store: atomic one-version merge publishes, history time-travels") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore-tx")
      .toString + "/dim"
    val batches = randomBatches(77L, 4)
    val initial = Scd2.initialLoad(batches.head, nk, "ts", attrs,
      tiebreak = Seq("email", "tier"))
    val store = new TxLogDimStore(spark, dir)
    store.init(initial)
    var rewriteState = initial
    val history = scala.collection.mutable.ArrayBuffer(
      sortedState(rewriteState))
    batches.tail.foreach { batch =>
      val delta = Scd2.incrementalDelta(rewriteState, batch, nk, "ts",
        attrs, tiebreak = Seq("email", "tier"))
      store.publish(delta, nk, "effective_start_ts")
      rewriteState = Scd2.incrementalMerge(rewriteState, batch, nk, "ts",
        attrs, tiebreak = Seq("email", "tier"))
      history += sortedState(rewriteState)
      sortedState(store.read()) shouldBe sortedState(rewriteState)
    }
    // ONE version per publish — merge is a single atomic commit, not a
    // delete+append pair
    TxLog.currentVersion(dir) shouldBe Some(batches.tail.size.toLong)
    // every historical dimension state is still served exactly
    history.zipWithIndex.foreach { case (h, v) =>
      sortedState(TxLog.read(spark, dir, asOf = Some(v.toLong))) shouldBe h
    }
  }

  test("rewrite store round-trips through parquet with an atomic swap") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore").toString + "/dim"
    val batches = randomBatches(42L, 3)
    val initial = Scd2.initialLoad(batches.head, nk, "ts", attrs,
      tiebreak = Seq("email", "tier"))
    val store = new RewriteDimStore(spark, dir)
    store.init(initial)
    var expected = initial
    batches.tail.foreach { batch =>
      val delta = Scd2.incrementalDelta(store.read(), batch, nk, "ts",
        attrs, tiebreak = Seq("email", "tier"))
      store.publish(delta, nk, "effective_start_ts")
      expected = Scd2.incrementalMerge(expected, batch, nk, "ts",
        attrs, tiebreak = Seq("email", "tier"))
    }
    sortedState(store.read()) shouldBe sortedState(expected)
  }

  test("format flag: rewrite resolves, lakehouse formats fail with a named seam error") {
    DimStore.forPath(spark, "/tmp/x") shouldBe a[RewriteDimStore]
    spark.conf.set(DimStore.StoreKey, "merge")
    try DimStore.forPath(spark, "/tmp/x") shouldBe a[ParquetMergeDimStore]
    finally spark.conf.unset(DimStore.StoreKey)
    spark.conf.set(DimStore.StoreKey, "txlog")
    try DimStore.forPath(spark, "/tmp/x") shouldBe a[TxLogDimStore]
    finally spark.conf.unset(DimStore.StoreKey)
    spark.conf.set(DimStore.StoreKey, "delta")
    try {
      val e = intercept[IllegalArgumentException] {
        DimStore.forPath(spark, "/tmp/x")
      }
      e.getMessage should include("SCALING.md")
      e.getMessage should include("config change")
    } finally spark.conf.unset(DimStore.StoreKey)
  }
}
