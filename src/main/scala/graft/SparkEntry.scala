package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.bronze.Validation
import graft.bronze.Validation.{nonNegative, notEmpty, notNull, Rule}
import graft.core.Tables
import graft.gold.{DataQuality, DimDate, Scd2, SurrogateKeys}
import graft.silver.{Dedup, Enrich, Impute}

/** Driver contract: one declared query per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent oracle over the same parquet
  * tables.
  *
  * Oracle-stability rules used throughout (Spark ⟷ DuckDB must hash-match):
  *  - Money/ratio aggregates go through exact integer cents:
  *    `sum(round(x*100))::bigint` — double sums of integers are
  *    order-independent below 2^53, so shuffle/partition order can't change
  *    the hash. Ratios are a SINGLE division of two exact integers.
  *  - Timestamps stay TIMESTAMP_NTZ end-to-end (testdata is NTZ; DuckDB is
  *    naive).
  *  - Every window/top-K has a total deterministic ordering (explicit
  *    tiebreak columns).
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String): Tables = Tables(s, dir)

  /** sum of a 2-decimal double column as exact integer cents. */
  private def sumCents(c: Column): Column = sum(round(c * 100)).cast("long")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qPricingSummary(spark, "/root/testdata/sf0.001")

  // ===========================================================================
  // A — aggregations
  // ===========================================================================

  /** A1: multi-aggregate groupBy (TPC-H Q1 shape). */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame =
    T(s, dir).lineitem
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sumCents(col("l_extendedprice")).as("sum_base_cents"),
        sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_cents"),
        (sum(round(col("l_discount") * 100)) / count(lit(1)) / lit(100)).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** A2: conditional aggregation (hand-pivot), total = sum of parts. */
  private def qConditionalAgg(s: SparkSession, dir: String): DataFrame =
    T(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("total_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fulfilled_orders"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_orders"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("pending_orders"),
        sumCents(col("o_totalprice")).as("total_cents")
      )
      .orderBy("o_orderpriority")

  /** A3: frequency + top-K via TakeOrderedAndProject (no global sort). */
  private def qTopBrands(s: SparkSession, dir: String): DataFrame =
    T(s, dir).part
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("p_brand"))
      .limit(10)

  /** A4: distinct counts. */
  private def qDistinctCounts(s: SparkSession, dir: String): DataFrame =
    T(s, dir).customer.agg(
      countDistinct(col("c_mktsegment")).as("n_segments"),
      countDistinct(col("c_nationkey")).as("n_nations"),
      count(lit(1)).as("n_rows")
    )

  /** A5: whole-table scalar aggregates. */
  private def qScalarStats(s: SparkSession, dir: String): DataFrame =
    T(s, dir).lineitem.agg(
      max(col("l_orderkey")).as("max_orderkey"),
      min(col("l_shipdate")).as("min_shipdate"),
      max(col("l_quantity")).as("max_qty"),
      countDistinct(col("l_suppkey")).as("n_suppliers")
    )

  /** A6: frequency classification via threshold when-chain (integer math —
    * `cnt*1000 >= total*N` avoids ratio FP entirely).
    */
  private def qEventTypeClasses(s: SparkSession, dir: String): DataFrame = {
    val counts = T(s, dir).events.groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val total  = sum(col("cnt")).over(Window.partitionBy())
    counts
      .withColumn(
        "category",
        when(col("cnt") * 1000 >= total * 200, "popular")
          .when(col("cnt") * 1000 >= total * 199, "common")
          .otherwise("rare")
      )
      .orderBy("event_type")
  }

  /** Multi-join + agg + top-K (TPC-H Q3 shape): shipping-priority revenue.
    * Three-way join with selective filters on both fact sides — Catalyst
    * reorders and pushes; revenue in exact cents.
    */
  private def qShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val t      = T(s, dir)
    val cutoff = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders.filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Five-way join through the region hierarchy (TPC-H Q5 shape): revenue
    * by nation where supplier and customer share the nation.
    */
  private def qLocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(t.supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  /** TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    * quarter. Selective filters (date window, returnflag) push below the
    * joins; nation broadcasts; the top-K compiles to
    * TakeOrderedAndProject. Explicit c_custkey tiebreak keeps the #20
    * boundary deterministic.
    */
  private def qReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val t  = T(s, dir)
    val lo = lit("1996-10-01").cast("date")
    val hi = lit("1997-01-01").cast("date")
    t.customer
      .join(t.orders.filter(
        col("o_orderdate").cast("date") >= lo && col("o_orderdate").cast("date") < hi),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q8 shape: national market share — the widest join in the suite
    * (part, lineitem, orders, supplier, customer, nation×2, region).
    * Selective filters push to the scans; the three dim joins broadcast;
    * the share is a SINGLE division of exact cent sums per year (the
    * oracle-stability rule for ratios). Years with zero nation volume get
    * share 0.0 via coalesce, not NULL.
    */
  private def qMarketShare(s: SparkSession, dir: String): DataFrame = {
    val t  = T(s, dir)
    val lo = lit("1995-01-01").cast("date")
    val hi = lit("1997-01-01").cast("date")
    val custNation = t.nation.select(
      col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val suppNation = t.nation.select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    t.part.filter(col("p_type") === "PROMO")
      .join(t.lineitem, col("p_partkey") === col("l_partkey"))
      .join(t.orders.filter(
        col("o_orderdate").cast("date") >= lo && col("o_orderdate").cast("date") < hi),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("cn_region") === col("r_regionkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .withColumn("o_year", year(col("o_orderdate").cast("date")))
      .withColumn("vol_cents",
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
      .groupBy("o_year")
      .agg(
        coalesce(sum(when(col("supp_nation") === "NATION_2", col("vol_cents"))), lit(0L))
          .as("nation_cents"),
        sum(col("vol_cents")).as("total_cents"))
      .withColumn("mkt_share",
        col("nation_cents").cast("double") / col("total_cents").cast("double"))
      .orderBy("o_year")
  }

  /** One-pass column profiler (library: gold.DataQuality.profile) — the
    * per-column EDA/DQ report in a single scan.
    */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    DataQuality.profile(
      T(s, dir).customer,
      Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))

  /** A11: top-3 parts per brand by revenue (library: operators.GroupTopK;
    * WindowGroupLimit prunes to k rows per group map-side — plan-asserted).
    */
  private def qGroupTopK(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val rev = t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
    graft.operators.GroupTopK.topKPerGroup(
      rev, Seq("p_brand"), Seq(col("revenue_cents").desc, col("p_partkey")), k = 3)
  }

  /** A12: fixed-range integer histogram over order totals in cents
    * (library: gold.DataQuality.histogram) — 12 × 5,000,000-cent buckets.
    */
  private def qHistogram(s: SparkSession, dir: String): DataFrame =
    DataQuality.histogram(
      T(s, dir).orders.select(round(col("o_totalprice") * 100).cast("long").as("cents")),
      col("cents"), lo = 0L, hi = 59999999L, bins = 12)

  // ===========================================================================
  // W — window functions
  // ===========================================================================

  /** W1: dedup keep-latest (library: silver.Dedup). */
  private def qDedupLatest(s: SparkSession, dir: String): DataFrame =
    Dedup
      .keepLatest(T(s, dir).events, Seq("user_id"), "ts", Seq(col("event_id").desc))
      .select("user_id", "event_id", "event_type", "value", "ts")

  /** W2: lag change detection (null-safe). */
  private def qLagChanges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    T(s, dir).events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("changed", !(col("event_type") <=> col("prev_type")))
      .select("user_id", "event_id", "event_type", "prev_type", "changed")
  }

  /** W2+W3: SCD2 initial load from a change log (library: gold.Scd2).
    * event_type tiebreak makes same-microsecond observations (possible
    * after ns→µs truncation) order identically in both engines.
    */
  private def qScd2Intervals(s: SparkSession, dir: String): DataFrame =
    Scd2
      .initialLoad(
        T(s, dir).events.select("user_id", "ts", "event_type"),
        nk = Seq("user_id"),
        orderCol = "ts",
        attrs = Seq("event_type"),
        tiebreak = Seq("event_type")
      )
      .select("user_id", "event_type", "effective_start_ts", "effective_end_ts", "is_current")

  /** J5-shaped SCD2 incremental merge; oracle = full-history rebuild (merge
    * of a split change log must equal the SCD2 of the whole log).
    */
  private def qScd2Incremental(s: SparkSession, dir: String): DataFrame = {
    val ev     = T(s, dir).events.select("user_id", "ts", "event_type")
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val existing = Scd2.initialLoad(
      ev.filter(col("ts") < cutoff), Seq("user_id"), "ts", Seq("event_type"),
      tiebreak = Seq("event_type"))
    val merged = Scd2.incrementalMerge(
      existing, ev.filter(col("ts") >= cutoff), Seq("user_id"), "ts",
      Seq("event_type"), tiebreak = Seq("event_type"))
    merged.select("user_id", "event_type", "effective_start_ts", "effective_end_ts", "is_current")
  }

  /** Gold SCD2 dim through the FULL pipeline materialization cycle: build
    * history (W3 semantics) → assign scalable SKs → write parquet with the
    * pipeline's layout → read it back. The oracle recomputes the dim
    * directly, so the gate also covers the write/read round-trip
    * (timestamp/boolean parquet fidelity), not just in-memory dataflow.
    */
  private def qGoldScd2Dim(s: SparkSession, dir: String): DataFrame = {
    val hist = Scd2.initialLoad(
      T(s, dir).events.select("user_id", "ts", "event_type"),
      nk = Seq("user_id"), orderCol = "ts", attrs = Seq("event_type"),
      tiebreak = Seq("event_type"))
    // (effective_start_ts, user_id) is unique — a total ordering, so the
    // SKs are deterministic and oracle-reproducible via row_number
    val keyed = SurrogateKeys.scalableMode(
      hist.select("user_id", "event_type",
        "effective_start_ts", "effective_end_ts", "is_current"),
      Seq(col("effective_start_ts"), col("user_id")), "dim_sk")
    val path = "/tmp/graft_roundtrip/dim_event_scd2"
    keyed.coalesce(1).write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  /** W4: surrogate keys (reference mode — unpartitioned row_number). */
  private def qSurrogateKeys(s: SparkSession, dir: String): DataFrame =
    SurrogateKeys
      .referenceMode(T(s, dir).customer, Seq(col("c_custkey")), "customer_sk", offset = 1000L)
      .select("c_custkey", "customer_sk")

  /** W4b: surrogate keys, scalable mode (range-sort + zipWithIndex — no
    * single-partition window). The ordering is total, so the assigned SKs
    * are identical to reference mode and the two queries share one oracle.
    */
  private def qSurrogateKeysScalable(s: SparkSession, dir: String): DataFrame =
    SurrogateKeys
      .scalableMode(T(s, dir).customer, Seq(col("c_custkey")), "customer_sk", offset = 1000L)
      .select("c_custkey", "customer_sk")

  /** W5: YoY growth via lag over yearly totals. */
  private def qYoyGrowth(s: SparkSession, dir: String): DataFrame = {
    val yearly = T(s, dir).orders
      .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
      .agg(count(lit(1)).as("cnt"), sumCents(col("o_totalprice")).as("total_cents"))
    val w = Window.orderBy(col("yr"))
    yearly
      .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
      .withColumn(
        "growth_pct",
        when(col("prev_cnt").isNotNull,
          (col("cnt") - col("prev_cnt")) * lit(100.0) / col("prev_cnt"))
      )
      .orderBy("yr")
  }

  /** W6: percent-of-total via empty-frame window. */
  private def qPctOfTotal(s: SparkSession, dir: String): DataFrame = {
    val byStatus = T(s, dir).orders.groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    byStatus
      .withColumn("pct", col("cnt") * lit(100.0) / sum(col("cnt")).over(Window.partitionBy()))
      .orderBy("o_orderstatus")
  }

  /** W7: trailing frame (6 preceding .. 1 preceding) over daily counts. */
  private def qTrailingWindow(s: SparkSession, dir: String): DataFrame = {
    val daily = T(s, dir).orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("order_date")).rowsBetween(-6, -1)
    daily
      .withColumn("trail_sum", sum(col("cnt")).over(w))
      .withColumn("trail_n", count(col("cnt")).over(w))
      .withColumn(
        "trail_avg",
        when(col("trail_n") > 0, col("trail_sum") * lit(1.0) / col("trail_n")))
      .orderBy("order_date")
  }

  // ===========================================================================
  // J — joins
  // ===========================================================================

  /** J1: left-outer enrichment with Unknown defaults (library:
    * silver.Enrich.leftWithDefaults; dim broadcast — zero fact shuffle).
    */
  private def qEnrichDefaults(s: SparkSession, dir: String): DataFrame = {
    val t   = T(s, dir)
    val dim = t.customer.filter(col("c_custkey") % 7 =!= 0)
      .select("c_custkey", "c_name", "c_mktsegment")
    Enrich
      .leftWithDefaults(
        t.orders,
        dim,
        col("o_custkey") === col("c_custkey"),
        Map("c_name" -> "Unknown", "c_mktsegment" -> "XX")
      )
      .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
  }

  /** J2: filtering join (left_semi — the reference's inner+drop pattern). */
  private def qFilterExisting(s: SparkSession, dir: String): DataFrame = {
    val t   = T(s, dir)
    val dim = t.part.filter(col("p_size") > 25).select(col("p_partkey").as("l_partkey"))
    Enrich
      .filterExisting(t.lineitem, dim, Seq("l_partkey"))
      .select("l_orderkey", "l_linenumber", "l_partkey")
  }

  /** J3: fact→dim SK lookup with SK=0 fallback (broadcast dim). */
  private def qSkLookup(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val dim = t.customer.filter(col("c_custkey") % 10 =!= 0)
      .select(col("c_custkey").as("o_custkey"), (col("c_custkey") + 1000).as("customer_sk"))
    Enrich
      .lookupSk(t.orders, dim, "o_custkey", "customer_sk")
      .select("o_orderkey", "o_custkey", "customer_sk")
  }

  /** J4: left-anti FK integrity — dangling SKs (library: gold.DataQuality). */
  private def qFkIntegrity(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    DataQuality.danglingSks(
      t.lineitem.select(col("l_suppkey").as("sk")),
      t.supplier.filter(col("s_suppkey") <= 8).select(col("s_suppkey").as("sk")),
      "sk"
    )
  }

  /** J7+A8: single-row stats CROSS JOIN + z-score, with exact integer
    * moments (n, Σx, Σx²) so the FP expression tree is identical on both
    * engines.
    */
  private def qZscoreDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = T(s, dir).orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.agg(
      count(lit(1)).as("n"),
      sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("ss")
    )
    val mean  = col("s").cast("double") / col("n")
    val varPop = (col("ss") - (col("s") * col("s")).cast("double") / col("n")) / (col("n") - lit(1))
    daily
      .crossJoin(stats)
      .withColumn("zscore", (col("cnt") - mean) / sqrt(varPop))
      .select("order_date", "cnt", "zscore")
      .orderBy("order_date")
  }

  // ===========================================================================
  // S/P/U — sources, projections/validation, set ops, scalar functions
  // ===========================================================================

  /** S4: JSON-in-column extraction. Extraction goes through
    * floor(try_cast AS DOUBLE) so malformed ("60x") and non-integral (50.5)
    * values behave identically in both engines (NULL / floor) instead of
    * engine-specific cast semantics.
    */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    T(s, dir).events
      .withColumn("k",
        expr("CAST(floor(try_cast(get_json_object(props, '$.k') AS DOUBLE)) AS BIGINT)"))
      .filter(col("k") > 50)
      .select("event_id", "event_type", "k")

  /** Repo-local CSV fixture exercising every contract-CSV edge the bronze
    * ingest must survive: quoted multiline field, `""` escape, embedded
    * comma, malformed timestamp (null-on-malformed, row stays valid),
    * non-numeric counter (reject), blank/null natural keys, negative
    * counter, reversed timestamp pair. Reference Meta_Guideline.md:905-910.
    */
  val CsvFixturePath = "/root/repo/fixtures/datasets_contract.csv"

  /** S1: full contract-CSV bronze ingest (read → rename → coerce →
    * metadata → validate-tag) over the edge-case fixture. The one §2 source
    * operator whose semantics (multiLine, escape, ANSI try_to_timestamp /
    * try_cast null-on-malformed) parquet scans never exercise.
    */
  private def qCsvContract(s: SparkSession, dir: String): DataFrame = {
    val r = graft.bronze.BronzeIngest.ingest(
      s, CsvFixturePath, graft.schema.Contracts.datasets,
      runDate = "2024-06-01", sourceSystem = "contract_csv",
      ingestTs = Some("2024-06-01 00:00:00"))
    val out = r.tagged.select(
      col("dataset_id"), col("dataset_title"), col("dataset_subtitle"),
      col("owner_user_id"), col("total_views"), col("total_downloads"),
      col("created_ts").cast("timestamp_ntz").as("created_ts"),
      col("updated_ts").cast("timestamp_ntz").as("updated_ts"),
      col("dataset_type"), col("is_private"),
      col("run_date"), col("source_system"), col("reject_reason"))
    r.unpersist()
    out
  }

  /** Committed all-valid raw fixtures for the backfill gate (five contract
    * CSVs, every row passing its rule chain — the backfill proof is about
    * catchup mechanics, not validation, which `q_s1_csv_contract` owns).
    */
  val BackfillFixtureDir = "/root/repo/fixtures/backfill"

  /** Backfill/catchup (library: runner.MedallionPipeline.runFor — the
    * Airflow `catchup=True` loop): run the FULL medallion pipeline for two
    * consecutive run dates over the committed fixtures, then read the
    * multi-`run_date` `fact_competitions_yearly` the backfill produced.
    * The oracle recomputes the fact per run date straight from the raw
    * competitions CSV (all rows valid ⇒ bronze/silver are identity mod
    * typing), so a skipped date, a cross-date partition clobber, or a
    * wrong active-competition cutoff all hash-mismatch. The fixture's
    * C001 deadline (2024-06-01 12:00) sits BETWEEN the two run dates —
    * the active count must differ across partitions, pinning that each
    * date was computed with its own cutoff. Byte-identical re-backfill is
    * MedallionPipelineSpec's property.
    */
  private def qBackfillFact(s0: SparkSession, dir: String): DataFrame = {
    // fixture-scale pipeline: 32 shuffle partitions would be pure task
    // overhead across ~40 tiny jobs — scope a 1-partition conf to a child
    // (every layer output is coalesce(1) anyway); AQE's per-stage re-plan
    // is also pure overhead at this size
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 1)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_backfill_" + dir.replaceAll("[^A-Za-z0-9]", "_")).getPath
    graft.core.Fs.rmTree(new java.io.File(out))
    val reports = graft.runner.MedallionPipeline.runFor(
      s, BackfillFixtureDir, out, Seq("2024-06-01", "2024-06-02"))
    require(reports.forall(_.succeeded),
      "backfill failed: " + reports.map(_.toString).mkString("; "))
    s.read.parquet(s"$out/gold/fact_competitions_yearly")
      .select(col("run_date").cast("string").as("run_date"), col("year"),
        col("competitions_count"), col("active_competitions_count"),
        col("avg_prize"))
  }

  /** S5+U1: in-memory Unknown row unioned onto a scanned dim. */
  private def qInmemoryUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val unknown = Seq((-1, "UNKNOWN")).toDF("r_regionkey", "r_name")
    unknown.unionByName(T(s, dir).region).orderBy("r_regionkey")
  }

  /** U1/U2: union of two filtered subsets with provenance tag. */
  private def qUnionSubsets(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir).orders
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"), lit("hot").as("bucket"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_orderkey"), col("o_orderpriority"), lit("cold").as("bucket"))
    urgent.unionByName(low)
  }

  /** U3: distinct projection. */
  private def qDistinctPairs(s: SparkSession, dir: String): DataFrame =
    T(s, dir).customer.select("c_nationkey", "c_mktsegment").distinct()

  /** U4: dropDuplicates on a column subset (library: silver.Dedup). */
  private def qDropDupSubset(s: SparkSession, dir: String): DataFrame =
    Dedup.dropDuplicates(
      T(s, dir).lineitem.select("l_orderkey", "l_returnflag"),
      Seq("l_orderkey", "l_returnflag"))

  private def customerRules: Seq[Rule] = Seq(
    notNull("c_name"),
    nonNegative("c_acctbal"),
    notEmpty("c_mktsegment"),
    Rule("c_acctbal_too_large", col("c_acctbal") > 9000, Seq("c_acctbal"))
  )

  /** P5: validation rule chain → reject_reason (first match wins). */
  private def qValidationTagged(s: SparkSession, dir: String): DataFrame =
    Validation
      .tagged(T(s, dir).customer, customerRules)
      .select("c_custkey", "c_acctbal", "reject_reason")

  /** P6: split-by-predicate, rejects side. */
  private def qValidationRejects(s: SparkSession, dir: String): DataFrame = {
    val (_, rejects) = Validation.split(T(s, dir).customer, customerRules)
    rejects.select("c_custkey", "reject_reason")
  }

  /** P10: impute-with-flag missing-data strategy. */
  private def qImputeFlag(s: SparkSession, dir: String): DataFrame = {
    val withNulls = T(s, dir).customer.withColumn(
      "segment",
      when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")))
    Impute
      .withFlag(withNulls, "segment", lit("UNKNOWN"))
      .select("c_custkey", "segment", "segment_imputed")
  }

  /** P9: TRUE/FALSE/other boolean coercion. */
  private def qBoolParse(s: SparkSession, dir: String): DataFrame =
    T(s, dir).events
      .withColumn(
        "flag_str",
        when(col("value") > 150, "TRUE").when(col("value") < 50, "FALSE").otherwise("maybe"))
      .withColumn("is_flag", Impute.parseBoolean(col("flag_str")))
      .select("event_id", "flag_str", "is_flag")

  /** String function family. */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir).part.select(
      col("p_partkey"),
      lower(col("p_name")).as("name_lower"),
      regexp_replace(lower(col("p_type")), "[^a-z]", "").as("type_alpha"),
      trim(upper(col("p_brand"))).as("brand_up"),
      length(col("p_name")).as("name_len")
    )

  /** Date/time function family. */
  private def qDatetimeFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir).orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("yr"),
      quarter(col("o_orderdate")).cast("int").as("qtr"),
      month(col("o_orderdate")).cast("int").as("mth"),
      col("o_orderdate").cast("date").as("order_date"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
        .cast("int").as("days_to_2002"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus_30d")
    )

  /** Array family: split + explode (the reference's only generator). */
  private def qExplodeWords(s: SparkSession, dir: String): DataFrame =
    T(s, dir).part
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))

  /** Calendar dimension built distributively (library: gold.DimDate). */
  private def qDimDate(s: SparkSession, dir: String): DataFrame =
    DimDate.build(s, "2024-01-01", "2024-12-31")

  /** Gold composite: daily fact build + SK lookup + SK=0 fallback — the
    * reference's fact_dataset_owner_daily shape end-to-end.
    */
  private def qGoldFactDaily(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val daily = t.orders
      .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(
        count(lit(1)).as("orders_count"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_count"),
        sumCents(col("o_totalprice")).as("total_cents")
      )
    val dim = t.customer.filter(col("c_custkey") % 10 =!= 0)
      .select(col("c_custkey").as("o_custkey"), (col("c_custkey") + 1000).as("customer_sk"))
    Enrich
      .lookupSk(daily, dim, "o_custkey", "customer_sk")
      .select("o_custkey", "customer_sk", "order_date", "orders_count", "open_count", "total_cents")
  }

  /** Gold publish leg (reference: Redshift Serverless COPY of gold
    * tables): the daily fact is published into a JDBC warehouse (DuckDB
    * file — the offline stand-in), published a SECOND time for the same
    * run dates to exercise the delete-then-insert idempotency in the gate
    * itself (a duped second publish would double row counts and
    * hash-mismatch), then read BACK through JDBC. The oracle is the fact
    * computed directly from parquet — so the gate proves the full
    * publish→warehouse→read-back loop is lossless AND idempotent.
    */
  private def qGoldPublishJdbc(s: SparkSession, dir: String): DataFrame = {
    // A 1-in-16 customer slice: the publish→delete→re-publish→read-back
    // loop proves losslessness + idempotency identically at any size, and
    // the remaining cost is the WAREHOUSE's row-insert throughput (DuckDB
    // JDBC ~4k rows/s), not a Spark-side cost worth benching at full SF.
    val fact = qGoldFactDaily(s, dir).filter(col("o_custkey") % 16 === 1)
    val db = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_publish_" + dir.replaceAll("[^A-Za-z0-9]", "_") + ".duckdb")
    Seq("", ".wal").foreach(sfx => new java.io.File(db.getPath + sfx).delete())
    val url = "jdbc:duckdb:" + db.getPath
    graft.gold.JdbcPublish.publishIdempotent(
      fact, url, "fact_dataset_owner_daily", "order_date")
    graft.gold.JdbcPublish.publishIdempotent(
      fact, url, "fact_dataset_owner_daily", "order_date")
    graft.gold.JdbcPublish.readBack(s, url, "fact_dataset_owner_daily")
  }

  /** Streaming batch-equivalence: events streamed file-by-file through the
    * watermark-capable tumbling-window aggregate (library:
    * streaming.EventStream.replayWindowedAgg); final state must equal the
    * same windows computed batch-side by the oracle.
    */
  private def qStreamWindowReplay(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayWindowedAgg(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_events")

  /** APPEND-MODE windowed replay (library:
    * streaming.EventStream.replayWindowedAggAppend): watermarked windows
    * emitted exactly once on expiry (finalize-once), end-of-stream flush
    * via sentinel; the emitted set must equal the FULL batch window set —
    * same oracle as the complete-mode gate, so the two watermark
    * semantics classes are pinned against one another.
    */
  private def qStreamAppendReplay(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayWindowedAggAppend(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_append_events")

  /** STATEFUL STREAMING DEDUP batch equivalence (library:
    * streaming.EventStream.replayDedupStream /
    * dropDuplicatesWithinWatermark): every third event re-arrives ONE
    * HOUR later as a payload copy under the same event_id — within the
    * 2 h watermark delay, so state is contractually still alive — and
    * the replay must emit exactly one row per original event. Duplicates
    * near a file boundary straddle micro-batches, exercising CROSS-BATCH
    * dedup state. The projection drops `ts`: which physical copy
    * survives inside a single micro-batch is engine-unspecified (the
    * copies differ only in ts), and the contract worth pinning is the
    * key set + payload, which the pre-salt oracle states exactly.
    */
  private def qStreamDedupReplay(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir).events
    val dups = ev.filter(pmod(col("event_id"), lit(3)) === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
    graft.streaming.EventStream.replayDedupStream(
      ev.unionByName(dups), "/tmp/graft_roundtrip/stream_dedup_events")
      .select("event_id", "user_id", "event_type", "value_cents")
  }

  /** SESSION-WINDOW streaming batch equivalence (library:
    * streaming.EventStream.replaySessionWindow): data-dependent-extent
    * windows (a session grows until a 6 h silence) replayed
    * file-by-file in APPEND mode, each session emitted exactly once on
    * watermark expiry, end-of-stream flush via sentinel. The oracle is
    * DuckDB's gap-islands sessionization. BOUNDARY SEMANTICS: Spark's
    * session_window merges on overlap-OR-ADJACENCY — an event at EXACTLY
    * gap distance EXTENDS the session (empirically pinned by
    * EventStreamSpec's boundary test; the intuitive half-open
    * [start, end) reading predicts a split and is wrong) — so the
    * oracle breaks on `diff > gap`, the same boundary as the batch
    * Sessionize / q_w8.
    */
  private def qStreamSessionReplay(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replaySessionWindow(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_session_events")

  /** CUSTOM STREAMING STATE batch equivalence (library:
    * streaming.EventStream.replayRunningStats / mapGroupsWithState —
    * the KeyValueGroupedDataset custom-state path): running per-user
    * totals maintained across micro-batches in update mode; the final
    * state per user (selected by the strictly-monotone running count)
    * must equal the plain batch groupBy.
    */
  private def qStreamRunningStats(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayRunningStats(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_running_events")

  /** CUSTOM-STATE sessionization batch equivalence (library:
    * streaming.EventStream.replayCustomSession — flatMapGroupsWithState
    * with EVENT-TIME TIMEOUT, the general state API): the same session
    * semantics as q_o_stream_session_replay's session_window path,
    * rebuilt from per-key state + watermark timeouts, gated against the
    * IDENTICAL DuckDB gap-islands oracle so the two implementations pin
    * each other (merge-on-adjacency boundary included).
    */
  private def qStreamCustomSession(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayCustomSession(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_custom_session_events")

  /** TxLog STREAMING SOURCE (library: streaming.TxLogSource through
    * EventStream.replayTxLogIncremental): a three-commit TxLog table
    * streamed in COMMIT ORDER (offset = log version, one commit per
    * micro-batch, add files read IN PLACE — no staging copy) through the
    * windowed aggregation — the read side of the lakehouse↔streaming
    * loop. The source plans batches from the VERSION RECORDS, never the
    * directory listing: the gate plants an UNCOMMITTED orphan data file
    * (a crashed writer's leftover — a full duplicate of one slice) in the
    * table dir, and the oracle counts every committed row exactly once,
    * so a directory-following source would double one third of the
    * counts and hash-mismatch. The default no-op `between` still restarts
    * the drained query once, pinning that a no-new-data restart leaves
    * the checkpointed state untouched.
    */
  private def qStreamTxLogSource(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val table = "/tmp/graft_roundtrip/stream_txsrc_table"
    graft.core.Fs.rmTree(new java.io.File(table))
    val ev = T(s, dir).events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"))
    TxLog.init(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
    TxLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 1), table, 0L)
    TxLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 2), table, 1L)
    // the poison pill: uncommitted files in the table dir (written, never
    // published — exactly what a writer crash leaves behind)
    ev.filter(pmod(col("event_id"), lit(3)) === 0)
      .write.mode("append").parquet(table)
    graft.streaming.EventStream.replayTxLogIncremental(
      s, table, "/tmp/graft_roundtrip/stream_txsrc_work")
  }

  /** INCREMENTAL TxLog streaming source (library: streaming.TxLogSource +
    * EventStream.replayTxLogIncremental — the real Delta-source shape,
    * offset = log version, add files read IN PLACE with zero staging
    * copies): three commits are consumed one-per-micro-batch, the query
    * STOPS, two MORE commits land while it is down, and the query
    * RESTARTS from the same checkpoint — it must resume at exactly the
    * next unread version on top of its checkpointed aggregation state.
    * The same uncommitted-orphan poison pill as q_o_stream_txlog_source
    * sits in the table dir (the source plans batches from the version
    * records, never the listing). Oracle = every committed row exactly
    * once: re-served versions double pre-stop counts, skipped versions
    * drop the post-restart slices, orphan-following doubles one fifth.
    */
  private def qStreamTxLogIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val table = "/tmp/graft_roundtrip/stream_txinc_table"
    graft.core.Fs.rmTree(new java.io.File(table))
    val ev = T(s, dir).events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"))
    TxLog.init(ev.filter(pmod(col("event_id"), lit(5)) === 0), table)
    TxLog.append(ev.filter(pmod(col("event_id"), lit(5)) === 1), table, 0L)
    TxLog.append(ev.filter(pmod(col("event_id"), lit(5)) === 2), table, 1L)
    // uncommitted orphan: written into the table dir, never published
    ev.filter(pmod(col("event_id"), lit(5)) === 0)
      .write.mode("append").parquet(table)
    graft.streaming.EventStream.replayTxLogIncremental(
      s, table, "/tmp/graft_roundtrip/stream_txinc_work",
      between = () => {
        TxLog.append(ev.filter(pmod(col("event_id"), lit(5)) === 3), table, 2L)
        TxLog.append(ev.filter(pmod(col("event_id"), lit(5)) === 4), table, 3L)
        ()
      })
  }

  /** TABLE-TO-TABLE incremental streaming pipeline (library:
    * streaming.TxLogSource → EventStream.runTxLogPipelineOnce →
    * gold.TxLog.appendIfNew — the lakehouse loop CLOSED end-to-end): a
    * bronze TxLog table streams through a row-level transform (purchases
    * only, money to exact cents) into a silver TxLog table with the
    * exactly-once txn sink. The pipeline runs, STOPS, a third bronze
    * commit lands while it is down, and it runs AGAIN from the same
    * checkpoint — source offsets and sink watermarks must BOTH resume:
    * re-consumed bronze versions or re-applied sink batches double rows,
    * skipped ones drop the late slice. Oracle = the purchases projection
    * in closed form.
    */
  private def qStreamTxLogPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val bronze = "/tmp/graft_roundtrip/stream_txpipe_bronze"
    val silver = "/tmp/graft_roundtrip/stream_txpipe_silver"
    val ckpt = "/tmp/graft_roundtrip/stream_txpipe_ckpt"
    Seq(bronze, silver, ckpt).foreach(p =>
      graft.core.Fs.rmTree(new java.io.File(p)))
    val ev = T(s, dir).events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"), col("user_id"),
      col("event_type"), col("value"))
    def transform(b: DataFrame): DataFrame =
      b.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("date").as("day"),
          round(col("value") * 100).cast("long").as("value_cents"))
    TxLog.init(ev.filter(pmod(col("event_id"), lit(3)) === 0), bronze)
    TxLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 1), bronze, 0L)
    TxLog.init(s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      transform(ev).schema), silver)
    graft.streaming.EventStream.runTxLogPipelineOnce(
      s, bronze, silver, ckpt, transform)
    // a late bronze commit lands while the pipeline is DOWN…
    TxLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 2), bronze, 1L)
    // …and the restarted run must consume exactly that one version
    graft.streaming.EventStream.runTxLogPipelineOnce(
      s, bronze, silver, ckpt, transform)
    TxLog.read(s, silver)
  }

  /** PARTITION-FILTERED incremental streaming (library:
    * streaming.TxLogSource's `partitionFilter` option over a PARTITIONED
    * TxLog table — file-level partition admission from the log's
    * recorded partition values: a consumer of one partition of a 100-TB
    * table reads only its own files, and the filtered view is
    * append-only ON ITS OWN TERMS — a partition deleted ELSEWHERE in the
    * table mid-history passes as an invisible empty batch, no
    * ignoreDeletes needed, where the unfiltered source would fail the
    * stream). The oracle recomputes the filtered partition's rows in
    * closed form: a stream that read other partitions' files, dropped a
    * version, or choked on the foreign delete all mismatch.
    */
  /** STREAMING ACROSS A COLUMN-RENAME BOUNDARY (library: the pinned
    * column mapping in streaming.TxLogVersionedSource — round-14 verdict
    * item 2): a table renamed BEFORE the stream starts serves the old
    * files' values under the NEW logical name (physical identity is
    * stable, the pinned mapping physicalizes the read); the query stops,
    * an append plus a SECOND rename land while it is down, and the
    * RESTARTED query re-pins the newest mapping, resumes its offsets
    * (committed batches serve empty), and serves exactly the missed rows
    * under the newest name. Phase-tagged aggregates: 'pre' = the first
    * run's rows under `amount`, 'post' = the restarted run's rows under
    * `money` — a dropped batch, a double-read, or a mapping misread
    * hash-mismatches its phase.
    */
  private def qStreamTxLogRename(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val table = "/tmp/graft_roundtrip/stream_txrename_table"
    val work = "/tmp/graft_roundtrip/stream_txrename_work"
    Seq(table, work).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    val o = T(s, dir).orders.select(col("o_orderkey").as("id"),
      col("o_custkey").as("cust"), col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    TxLog.init(o.filter(col("id") % 3 === 0)
      .repartitionByRange(4, col("id")), table)                     // v0
    TxLog.renameColumn(table, "cents", "amount", 0L)                // v1
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 8)
    val sink = s"$work/sink"
    TxLog.init(o.withColumnRenamed("cents", "amount").limit(0), sink)
    def drain(): Unit = {
      val q = child.readStream.format("graft-txlog").option("path", table)
        .load()
        .writeStream.format("graft-txlog").option("path", sink)
        .option("appId", "rename_gate")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // serves v0 files under the renamed 'amount'
    val preCols = TxLog.read(s, sink).columns.toSeq
    // while the query is DOWN: new data + a SECOND rename
    TxLog.append(o.filter(col("id") % 3 === 1)
      .withColumnRenamed("cents", "amount"), table, 1L)             // v2
    TxLog.renameColumn(table, "amount", "money", 2L)                // v3
    drain() // restart re-pins 'money', serves exactly v2's rows
    // the sink table absorbed the shape change as ordinary schema
    // evolution: phase 'pre' rows carry `amount`, 'post' rows `money`
    val out = TxLog.read(s, sink)
    val renamedServed = preCols.contains("amount") &&
      !preCols.contains("money") && out.columns.contains("money")
    out.withColumn("phase",
        when(col("money").isNotNull, lit("post")).otherwise(lit("pre")))
      .groupBy("o_orderpriority", "phase")
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(col("money"), col("amount"))).as("total_cents"))
      .withColumn("renamed_names_served", lit(renamedServed))
  }

  private def qStreamTxLogPartition(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val table = "/tmp/graft_roundtrip/stream_txpart_table"
    val work = "/tmp/graft_roundtrip/stream_txpart_work"
    Seq(table, work).foreach(p => graft.core.Fs.rmTree(new java.io.File(p)))
    val ev = T(s, dir).events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"), col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"),
      pmod(col("event_id"), lit(4)).as("bucket"))
    TxLog.init(ev.filter(pmod(col("event_id"), lit(3)) === 0), table,
      partitionBy = Seq("bucket"))                                   // v0
    TxLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 1), table, 0L) // v1
    // a partition OUTSIDE the filtered view is dropped mid-history —
    // invisible to this consumer (the whole point of the filtered view)
    TxLog.deletePartitions(s, table, col("bucket") === 0L, 1L)       // v2
    TxLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 2), table, 2L) // v3
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", 8)
    val q = child.readStream.format("graft-txlog").option("path", table)
      .option("partitionFilter", "bucket = 2")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(s"$work/out")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value_cents").as("value_cents"))
  }

  /** STREAMING CHANGE DATA FEED consumer (library: streaming.TxLogCdfSource
    * → EventStream.runTxLogCdfMirrorOnce — the Delta readChangeFeed
    * streaming shape over the graft commit log): the q_o_txlog_cdf mixed
    * history (init, append, predicate DELETE, atomic key-replace) streams
    * as per-version insert/delete row batches into an epoch-versioned
    * keyed mirror, then the pipeline STOPS, a WIDENING append (schema
    * evolution) commits while it is down, and the resumed run folds
    * exactly that version on top. Oracle = the merge-mirror closed form:
    * a missed delete, a version applied out of order, a double-applied
    * redelivery, or old rows not NULL-aligned to the widened schema all
    * hash-mismatch.
    */
  private def qStreamTxLogCdf(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val table = "/tmp/graft_roundtrip/stream_txcdf_table"
    val mirror = "/tmp/graft_roundtrip/stream_txcdf_mirror"
    val ckpt = "/tmp/graft_roundtrip/stream_txcdf_ckpt"
    Seq(table, mirror, ckpt).foreach(p =>
      graft.core.Fs.rmTree(new java.io.File(p)))
    val o = T(s, dir).orders.select(col("o_orderkey").as("id"),
      col("o_custkey").as("cust"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    TxLog.init(o.filter(col("id") % 4 === 0)
      .repartitionByRange(4, col("id")), table)
    TxLog.append(o.filter(col("id") % 4 === 1), table, 0L)
    TxLog.deleteWhere(s, table, col("id") % 5 === 2, 1L)
    TxLog.replaceWhereKeys(s, table,
      o.filter(col("id") % 9 === 4).select("id"), Seq("id"),
      newData = o.filter(col("id") % 4 === 2 && col("id") % 9 === 4), 2L)
    graft.streaming.EventStream.runTxLogCdfMirrorOnce(
      s, table, mirror, Seq("id"), ckpt)
    // the widening append lands while the consumer is DOWN…
    TxLog.append(o.filter(col("id") % 4 === 3)
      .withColumn("flag", pmod(col("id"), lit(7)).cast("long")), table, 3L)
    // …and the resumed run must fold exactly that one version
    graft.streaming.EventStream.runTxLogCdfMirrorOnce(
      s, table, mirror, Seq("id"), ckpt)
    graft.streaming.EventStream.readCdfMirror(s, mirror)
  }

  /** STREAM–STATIC enrichment join (library:
    * EventStream.replayTxLogStaticEnrich over the graft-txlog source):
    * events stream from a two-commit TxLog table and each micro-batch
    * LEFT-joins the static customer dimension (no watermark, no state —
    * the per-batch broadcast enrich every incremental medallion silver
    * step runs). Oracle = the batch LEFT join in closed form: a dropped
    * unmatched event (inner-join semantics leaking in), a double-served
    * version, or a missed dim match all hash-mismatch.
    */
  private def qStreamStaticEnrich(s: SparkSession, dir: String): DataFrame = {
    import graft.gold.TxLog
    val table = "/tmp/graft_roundtrip/stream_txenrich_table"
    graft.core.Fs.rmTree(new java.io.File(table))
    val ev = T(s, dir).events.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"), col("user_id"),
      round(col("value") * 100).cast("long").as("value_cents"))
    TxLog.init(ev.filter(pmod(col("event_id"), lit(2)) === 0), table)
    TxLog.append(ev.filter(pmod(col("event_id"), lit(2)) === 1), table, 0L)
    graft.streaming.EventStream.replayTxLogStaticEnrich(
      s, table, "/tmp/graft_roundtrip/stream_txenrich_work",
      // even keys only: odd users NULL-extend, so the LEFT semantics are
      // actually exercised (the full dim covers every user at every SF)
      dimOf = c => T(c, dir).customer
        .filter(pmod(col("c_custkey"), lit(2)) === 0)
        .select(col("c_custkey"), col("c_mktsegment")),
      join = (stream, dim) => stream
        .join(dim, stream("user_id") === dim("c_custkey"), "left")
        .select(col("event_id"), col("user_id"),
          col("c_mktsegment").as("segment"), col("value_cents")))
  }

  /** EXACTLY-ONCE streaming TxLog sink (library:
    * streaming.EventStream.replayIntoTxLog + gold.TxLog.appendIfNew —
    * the Delta txn-action pattern): events replayed file-per-micro-batch
    * into an ACID TxLog table, every batch DELIBERATELY applied twice
    * with the same (appId, batchId) — the second apply must no-op
    * against the per-app txn watermark. Oracle = the plain events
    * projection: an idempotency leak doubles rows, a lost batch drops
    * them, and the 12-file replay crosses the log's checkpoint interval
    * so the final read resolves the watermark through a checkpoint.
    */
  private def qStreamTxLogSink(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayIntoTxLog(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_txlog_events",
      "/tmp/graft_roundtrip/stream_txlog_table")
      .select("event_id", "user_id", "event_type", "value_cents")

  /** EXACTLY-ONCE through the DECLARATIVE sink format (library:
    * streaming.TxLogSink behind `writeStream.format("graft-txlog")`) with
    * a REAL crash-window redelivery: the first run is killed AFTER the
    * mid-stream batch's table commit but BEFORE its engine commit marker
    * (sink fault injection), the restart redelivers that batch from the
    * same checkpoint, and the txn watermark must no-op it. Same oracle as
    * q_o_stream_txlog_sink (the plain events projection): a watermark
    * miss double-counts the redelivered batch, a lost batch drops rows.
    * Together the two gates pin both redelivery shapes — inline
    * double-apply and engine restart-redelivery — on both sink APIs
    * (foreachBatch and format).
    */
  private def qStreamTxLogSinkFmt(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayIntoTxLogFormatSink(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_txlogfmt_events",
      "/tmp/graft_roundtrip/stream_txlogfmt_table")
      .select("event_id", "user_id", "event_type", "value_cents")

  /** Stream-stream interval-join batch equivalence: the click→purchase
    * attribution join replayed file-by-file (library:
    * streaming.EventStream.replayAttributionJoin); every emitted match
    * must equal DuckDB's batch interval join — money in exact cents,
    * timestamps NTZ.
    */
  private def qStreamJoinReplay(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayAttributionJoin(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_join_events")
      .select(col("user_id"), col("purchase_id"),
        col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
        round(col("value") * 100).cast("long").as("value_cents"),
        col("click_id"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"))

  /** LATE-ARRIVAL batch equivalence: the SAME click→purchase interval
    * join as q_o_stream_join_replay, but files are delivered OUT OF
    * EVENT-TIME ORDER — a deterministic subset of rows is displaced two
    * files later than their in-order position, displacement bounded by
    * (watermark − interval) slack against the in-order split's prefix
    * maxima, so every row still arrives before the watermark passes its
    * event time. The oracle is the SAME batch interval join: a
    * watermark-late drop, a premature state eviction, or an
    * order-sensitive state bug all hash-mismatch. This pins the
    * late-but-in-watermark contract (the regime real streams live in) in
    * the driver correctness artifact, not only in the stream fuzzer.
    * The global-order rank is a HARNESS device (arrival assignment for
    * the file-replay rig, like writeTimeOrderedFiles' mod-time stamps) —
    * production arrival order comes from the source itself.
    */
  private def qStreamLateReplay(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = T(s, dir).events
    val nFiles = 6
    val intervalHours = 1
    val watermarkHours = 2
    val slackSec = (watermarkHours - intervalHours).toLong * 3600 - 1
    val n = ev.count()
    val ranked = ev.withColumn("__rank",
        row_number().over(Window.orderBy(col("ts"), col("event_id")))
          .cast("long") - 1)
      .withColumn("__file0", (col("__rank") * nFiles / n).cast("int"))
      .withColumn("__ts_s", unix_timestamp(col("ts").cast("timestamp")))
    // max event time of files STRICTLY BEFORE f under the in-order split
    // (6 rows — the displacement bound; conservative, since moves only
    // push rows later and can only shrink realized prefix maxima)
    val pref = ranked.groupBy(col("__file0").as("__pf"))
      .agg(max(col("__ts_s")).as("__fmax"))
      .withColumn("__pref", max(col("__fmax")).over(
        Window.orderBy(col("__pf")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pf"), col("__pref"))
    val assigned = ranked
      .withColumn("__target",
        least(lit(nFiles - 1), col("__file0") + lit(2)))
      .join(broadcast(pref), col("__target") === col("__pf"), "left")
      .withColumn("__late",
        pmod(col("event_id"), lit(3)) === 1 &&
          col("__target") > col("__file0") &&
          col("__pref").isNotNull &&
          (col("__pref") - col("__ts_s")) <= slackSec)
      .withColumn("__file",
        when(col("__late"), col("__target")).otherwise(col("__file0")))
    // the gate must actually exercise out-of-order delivery — an
    // accidentally-empty displacement set would silently degenerate to
    // the in-order gate
    val displaced = assigned.filter(col("__late")).count()
    require(displaced > 0,
      s"q_o_stream_late_replay: no rows displaced at $dir - gate degenerate")
    graft.streaming.EventStream.replayAttributionJoin(
      assigned, "/tmp/graft_roundtrip/stream_late_events",
      nFiles, intervalHours, watermarkHours, arrivalCol = Some("__file"))
      .select(col("user_id"), col("purchase_id"),
        col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
        round(col("value") * 100).cast("long").as("value_cents"),
        col("click_id"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"))
  }

  /** Stream-stream LEFT OUTER join batch equivalence (library:
    * streaming.EventStream.replayOuterJoin): every click paired with its
    * following-hour purchases or NULL-extended on watermark expiry; final
    * sink must equal DuckDB's batch LEFT JOIN. The sentinel-flush
    * mechanics live in the library; the oracle sees only real events.
    */
  private def qStreamOuterReplay(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.replayOuterJoin(
      T(s, dir).events, "/tmp/graft_roundtrip/stream_outer_events")
      .select(col("user_id"), col("click_id"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"),
        col("purchase_id"),
        col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
        round(col("value") * 100).cast("long").as("value_cents"))

  /** W8: batch sessionization (gaps-and-islands — library:
    * operators.Sessionize).
    */
  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize
      .gapSessions(T(s, dir).events, Seq("user_id"), "ts", "30 MINUTE")
      .select("user_id", "session_id", "n_events", "session_start", "session_end")

  /** W9: RANGE frame over a TRUE day index (days since epoch) — a genuine
    * trailing-7-calendar-day window even across month/year boundaries and
    * with missing days. (A yyyymmdd-encoded int would silently break at
    * month starts: 19980301-6 excludes all of February.)
    */
  private def qRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val daily = T(s, dir).orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("day_idx",
        datediff(col("order_date"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy(col("day_idx")).rangeBetween(-6, 0)
    daily
      .withColumn("range_sum", sum(col("cnt")).over(w))
      .select("order_date", "day_idx", "cnt", "range_sum")
      .orderBy("order_date")
  }

  /** Time-series gap filling: left join daily counts onto a dense calendar
    * spine (`sequence` + explode) so missing days appear as zero — the
    * standard completeness step before any trailing-window analytics.
    */
  private def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = T(s, dir).orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"))
      .agg(count(lit(1)).as("cnt"))
    val bounds = daily.agg(min("order_date").as("lo"), max("order_date").as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"))).as("order_date"))
    spine
      .join(daily, Seq("order_date"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("is_gap", col("cnt") === 0L)
      .orderBy("order_date")
  }

  /** A9b: exact interpolated percentiles PER GROUP. */
  private def qGroupPercentiles(s: SparkSession, dir: String): DataFrame =
    T(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** A2 via the native pivot operator (reference hand-pivots with
    * conditional sums; Spark has the relational operator).
    */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    T(s, dir).orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  /** Backward as-of join (operator Spark lacks; composed union+window —
    * library: operators.AsOfJoin; oracle: DuckDB native ASOF JOIN).
    */
  private def qAsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir).events
    graft.operators.AsOfJoin.backward(
      left = ev.select("event_id", "user_id", "ts", "event_type"),
      right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("pid"), col("value")),
      keys = Seq("user_id"),
      leftTs = "ts",
      rightTs = "ts",
      rightVals = Seq("pid" -> "purchase_event_id", "value" -> "last_purchase_value"),
      rightTiebreak = Seq("pid") // input-name resolution
    )
  }

  /** FORWARD as-of join with tolerance (library: operators.AsOfJoin): for
    * each click, the user's NEXT purchase — but only if it happens within
    * 7 days (the pandas merge_asof tolerance semantic: a nearest match
    * beyond tolerance is nulled, not replaced by a farther one). Oracle:
    * DuckDB native forward ASOF + CASE-wrapped tolerance.
    */
  private def qAsOfForward(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir).events
    graft.operators.AsOfJoin.asOf(
      left = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts"),
      right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("pid"), col("value")),
      keys = Seq("user_id"),
      leftTs = "ts",
      rightTs = "ts",
      rightVals = Seq("pid" -> "next_purchase_id", "value" -> "next_purchase_value"),
      direction = "forward",
      tolerance = Some(expr("INTERVAL 7 DAYS")),
      rightTiebreak = Seq("pid")
    )
  }

  /** Point-in-interval range join (library: operators.RangeJoin): match
    * every part to the OVERLAPPING retail-price bands containing it. There
    * is no equi-key at all, so the naive formulation plans as a
    * BroadcastNestedLoopJoin; the operator's bucket rewrite turns it into
    * an ordinary equi-join on the bucket id (plan-asserted in
    * OperatorsSpec). The oracle is the plain SQL range predicate.
    */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(24).select(
      col("id").cast("int").as("band_id"),
      (lit(89000L) + col("id") * lit(500L)).as("lo_cents"),
      (lit(89000L) + col("id") * lit(500L) + lit(1999L)).as("hi_cents"))
    val pts = T(s, dir).part.select(col("p_partkey"),
      round(col("p_retailprice") * 100).cast("long").as("price_cents"))
    graft.operators.RangeJoin.pointInInterval(
      pts, bands, "price_cents", "lo_cents", "hi_cents", bucketWidth = 500L)
      .select("band_id", "p_partkey", "price_cents", "lo_cents", "hi_cents")
  }

  /** The SAME range join written NAIVELY (a raw range predicate, which
    * Spark alone plans as a BroadcastNestedLoopJoin), relying on the
    * injected `plans.RewriteRangeJoin` optimizer rule to bucketize it —
    * proves the SparkSessionExtensions path end-to-end through the oracle
    * gate, not just in a plan spec. The width conf is the rule's opt-in.
    */
  private def qRangeJoinAuto(s0: SparkSession, dir: String): DataFrame = {
    // The width conf is set on an ISOLATED child session (shared
    // SparkContext, private SQLConf), never on the caller's: writes
    // re-optimize the logical plan at write time, so the conf must still
    // be set when Verify/Bench execute the frame — but setting it on the
    // shared session would leave RewriteRangeJoin armed for every query
    // built afterwards (order-dependent plan changes + the per-row span
    // guard). newSession() keeps the injected extensions and builder-time
    // confs, so the rule still fires — only the opt-in width is scoped.
    val s = s0.newSession()
    s.conf.set("spark.graft.rangeJoin.bucketWidth", "500")
    val bands = s.range(24).select(
      col("id").cast("int").as("band_id"),
      (lit(89000L) + col("id") * lit(500L)).as("lo_cents"),
      (lit(89000L) + col("id") * lit(500L) + lit(1999L)).as("hi_cents"))
    val pts = T(s, dir).part.select(col("p_partkey"),
      round(col("p_retailprice") * 100).cast("long").as("price_cents"))
    pts.join(bands,
        col("price_cents") >= col("lo_cents") &&
          col("price_cents") <= col("hi_cents"))
      .select("band_id", "p_partkey", "price_cents", "lo_cents", "hi_cents")
  }

  /** STRICT-bound auto range join over NEGATIVE-spanning data — pins the
    * two subtlest behaviors of `plans.RewriteRangeJoin` through the oracle
    * gate: (1) the bucket match is only a candidate superset and the
    * ORIGINAL strict predicate must be re-applied as a residual (a
    * boundary-equal point matches the bucket but not the join); (2) the
    * floor-division bucket id must stay exact below zero (prices are
    * re-centered so points and band bounds straddle zero — truncating
    * division would mis-bucket every negative point). Same child-session
    * conf scoping as `qRangeJoinAuto`.
    */
  private def qRangeJoinStrict(s0: SparkSession, dir: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.graft.rangeJoin.bucketWidth", "500")
    val bands = s.range(24).select(
      col("id").cast("int").as("band_id"),
      (lit(-6000L) + col("id") * lit(500L)).as("lo_cents"),
      (lit(-6000L) + col("id") * lit(500L) + lit(2000L)).as("hi_cents"))
    val pts = T(s, dir).part.select(col("p_partkey"),
      (round(col("p_retailprice") * 100).cast("long") - lit(95000L))
        .as("price_cents")) // cents run 90000–99990 → spans [-5000, 4990]
    pts.join(bands,
        col("price_cents") > col("lo_cents") &&
          col("price_cents") < col("hi_cents"))
      .select("band_id", "p_partkey", "price_cents", "lo_cents", "hi_cents")
  }

  /** Interval-overlap join (library: operators.RangeJoin): pairs of orders
    * by the same customer whose 30-day fulfillment windows overlap —
    * interval × interval, keyed, emitted exactly once per pair via the
    * overlap-start bucket rule (no post-join distinct).
    */
  private def qIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir).orders.select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"),
        lit("1990-01-01").cast("date")).cast("long").as("sd"))
    val a = o.select(col("o_custkey"), col("o_orderkey").as("key_a"),
      col("sd").as("lo_a"), (col("sd") + 30L).as("hi_a"))
    val b = o.select(col("o_custkey"), col("o_orderkey").as("key_b"),
      col("sd").as("lo_b"), (col("sd") + 30L).as("hi_b"))
    graft.operators.RangeJoin.intervalOverlap(
      a, b, "lo_a", "hi_a", "lo_b", "hi_b",
      bucketWidth = 32L, keys = Seq("o_custkey"))
      .filter(col("key_a") < col("key_b"))
      .select("o_custkey", "key_a", "key_b", "lo_a", "hi_a", "lo_b", "hi_b")
  }

  /** ORC source/sink round-trip: write a column-pruned supplier extract as
    * ORC, read it back. DuckDB has no ORC reader, so the oracle recomputes
    * the same projection from parquet — the gate thus covers ORC write+read
    * fidelity (types, nulls) end-to-end.
    */
  private def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = "/tmp/graft_roundtrip/supplier_orc"
    T(s, dir).supplier
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        round(col("s_acctbal") * 100).cast("long").as("acctbal_cents"))
      .coalesce(1).write.mode("overwrite").orc(path)
    s.read.orc(path)
  }

  /** JSON-lines sink + schema-first source (the S1 contract pattern over
    * JSON instead of CSV): write nation as JSON lines, re-ingest with an
    * explicit schema — no sampling-based inference in a pipeline.
    */
  private def qJsonLines(s: SparkSession, dir: String): DataFrame = {
    val path = "/tmp/graft_roundtrip/nation_json"
    T(s, dir).nation.select("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").json(path)
    s.read.schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .json(path)
  }

  /** Schema-evolution source: two parquet generations under one root —
    * generation 2 adds a column — read back with mergeSchema + partition
    * discovery (`g` inferred from the directory names). Generation 1's
    * missing column surfacing as NULL is the evolution contract every
    * long-lived table depends on.
    */
  private def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val path = "/tmp/graft_roundtrip/nation_evolve"
    val n = T(s, dir).nation
    n.select("n_nationkey", "n_name")
      .coalesce(1).write.mode("overwrite").parquet(path + "/g=1")
    n.select("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(path + "/g=2")
    s.read.option("mergeSchema", "true").parquet(path)
      .select(col("g").cast("int").as("g"), col("n_nationkey"),
        col("n_name"), col("n_regionkey"))
  }

  /** Point-in-time SCD2 lookup (library: gold.Scd2.pointInTimeLookup): for
    * each purchase event, the user-state version effective one microsecond
    * BEFORE the purchase — the standard fact-to-historical-dim attribution
    * read. Purchases that are the user's first-ever event exercise the
    * left-join NULL path. Equi-join on the NK + interval residual — never a
    * nested-loop range join (plan-asserted in GoldOpsSpec).
    */
  private def qScd2PitLookup(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir).events
    val dim = Scd2.initialLoad(
      ev.select("user_id", "ts", "event_type"),
      nk = Seq("user_id"), orderCol = "ts", attrs = Seq("event_type"),
      tiebreak = Seq("event_type"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"))
      .withColumn("lookup_ts", expr("timestampadd(MICROSECOND, -1, purchase_ts)"))
    Scd2.pointInTimeLookup(
      facts,
      dim.select(col("user_id"), col("event_type").as("prior_state"),
        col("effective_start_ts"), col("effective_end_ts")),
      nk = Seq("user_id"), factTs = "lookup_ts")
      .select(col("user_id"), col("event_id"), col("purchase_ts"),
        col("prior_state"), col("effective_start_ts").as("state_start_ts"))
  }

  /** Salted skew join (library: operators.SkewJoin) — the manual skew
    * mitigation for when AQE's runtime skew split can't apply. Results are
    * identical to the unsalted join, so the oracle IS the plain join.
    */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val fact = t.lineitem.select(
      col("l_partkey").as("partkey"), col("l_orderkey"), col("l_quantity"))
    val dim = t.part.select(col("p_partkey").as("partkey"), col("p_brand"))
    graft.operators.SkewJoin
      .saltedJoin(fact, dim, "partkey", saltFrom = Seq("l_orderkey"), n = 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** Snapshot CDC (library: operators.SnapshotDiff): classify keys across
    * two snapshot extracts as insert/delete/update. The snapshots are
    * deterministic slices of orders (key mod filters; a +500-cent bump on
    * keys divisible by 3 creates the updates), so the oracle replays the
    * same full-outer comparison.
    */
  /** Shared CDC fixture: two deterministic snapshot slices of orders (key
    * mod filters; a +500-cent bump on keys divisible by 3 creates the
    * updates). ONE definition so q_o_snapshot_diff and q_o_snapshot_apply
    * provably exercise the same scenario.
    */
  private def snapshotFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = T(s, dir).orders.select(
      col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val before = base.filter(col("o_orderkey") % 5 =!= 0)
    val after = base.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("price_cents",
        when(col("o_orderkey") % 3 === 0, col("price_cents") + 500L)
          .otherwise(col("price_cents")))
    (before, after)
  }

  private def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val (before, after) = snapshotFixture(s, dir)
    graft.operators.SnapshotDiff.diff(
      before, after, keys = Seq("o_orderkey"),
      attrs = Seq("o_orderstatus", "price_cents"))
  }

  /** CDC round-trip (library: operators.SnapshotDiff.applyDiff): applying
    * the computed diff to the before-snapshot must reconstruct the
    * after-snapshot EXACTLY — so the oracle is simply the after-snapshot
    * itself. Proves diff and apply are inverses through the gate, not just
    * in a unit fixture.
    */
  private def qSnapshotApply(s: SparkSession, dir: String): DataFrame = {
    val (before, after) = snapshotFixture(s, dir)
    val delta = graft.operators.SnapshotDiff.diff(
      before, after, keys = Seq("o_orderkey"),
      attrs = Seq("o_orderstatus", "price_cents"))
    graft.operators.SnapshotDiff.applyDiff(before, delta, Seq("o_orderkey"))
  }

  /** Incremental aggregate maintenance (library: operators.IncrementalAgg):
    * merge a batch's partial aggregates into a stored aggregate table. The
    * oracle is the FULL recompute over all orders — the merge invariant
    * `agg(A) ⊕ agg(B) == agg(A ∪ B)` is exactly what the gate checks.
    */
  private def qIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    // `grp` folds every 50th customer into a NULL key: the merge must treat
    // NULL as a real group (null-safe join), not split it across sides.
    // `last_urgent` is NULL for groups with no urgent orders on one (or
    // both) sides — the null-skipping min/max combine the oracle checks.
    val o = T(s, dir).orders
      .withColumn("grp",
        when(col("o_custkey") % 50 === 0, lit(null)).otherwise(col("o_custkey")))
    val cutoff = lit("1996-01-01").cast("date")
    def aggOf(df: DataFrame): DataFrame = df
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("cnt"),
        sumCents(col("o_totalprice")).as("total_cents"),
        min(col("o_orderdate").cast("date")).as("first_order"),
        max(col("o_orderdate").cast("date")).as("last_order"),
        max(when(col("o_orderpriority") === "1-URGENT",
          col("o_orderdate").cast("date"))).as("last_urgent"))
    val stored = aggOf(o.filter(col("o_orderdate").cast("date") < cutoff))
    val delta  = aggOf(o.filter(col("o_orderdate").cast("date") >= cutoff))
    graft.operators.IncrementalAgg.mergeAdditive(
      stored, delta, keys = Seq("grp"),
      sums = Seq("cnt", "total_cents"),
      mins = Seq("first_order"), maxs = Seq("last_order", "last_urgent"))
  }

  /** Delete-capable aggregate maintenance (library:
    * operators.RetractableAgg): an insert batch AND a delete batch flow
    * through the maintained per-group (count, sum, min, max) table;
    * counts/sums retract as negative deltas, min/max re-aggregate only
    * the groups whose extremum a delete touched. The oracle is the FULL
    * RECOMPUTE over base ∪ inserts ∖ deletes — the defining invariant.
    */
  private def qRetractableAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RetractableAgg
    val base = T(s, dir).lineitem.select(
      col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
      round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    val keys    = Seq("l_returnflag", "l_linestatus")
    val oldBase = base.filter(col("l_orderkey") % 10 =!= 7)
    val inserts = base.filter(col("l_orderkey") % 10 === 7)
    val deletes = base.filter(col("l_orderkey") % 10 === 3)
    val newBase = base.filter(col("l_orderkey") % 10 =!= 3)
    val stored = RetractableAgg.buildAgg(oldBase, keys,
      sums = Seq("price_cents"), mins = Seq("price_cents"),
      maxs = Seq("price_cents"))
    RetractableAgg.applyChanges(stored, newBase, inserts, deletes, keys,
      sums = Seq("price_cents"), mins = Seq("price_cents"),
      maxs = Seq("price_cents"))
  }

  /** Exact COUNT(DISTINCT) under deletes via the value-level refcount
    * store (the delete-capable complement of the HLL sketch store, which
    * cannot retract). Oracle = full COUNT(DISTINCT) recompute.
    */
  private def qRetractableDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RetractableAgg
    val base = T(s, dir).lineitem
      .select(col("l_orderkey"), col("l_returnflag"), col("l_partkey"))
    val oldBase = base.filter(col("l_orderkey") % 10 =!= 7)
    val inserts = base.filter(col("l_orderkey") % 10 === 7)
    val deletes = base.filter(col("l_orderkey") % 10 === 3)
    val store = RetractableAgg.buildDistinctStore(oldBase,
      Seq("l_returnflag"), "l_partkey")
    val maintained = RetractableAgg.maintainDistinctStore(store, inserts,
      deletes, Seq("l_returnflag"), "l_partkey")
    RetractableAgg.distinctCounts(maintained, Seq("l_returnflag"))
  }

  /** Incremental join-view maintenance (library: operators.IncrementalJoin):
    * maintain a materialized orders⋈customer view under snapshot deltas on
    * BOTH sides — inserts (keys absent from the old snapshots), updates (a
    * stale priority / bumped balance in the old image), and deletes
    * (synthetic old-only keys). The oracle is the FULL re-join of the new
    * snapshots (= the clean base tables), so the gate checks the
    * maintenance identity `merge(V, ΔA, ΔB) == A' ⋈ B'` end-to-end.
    */
  /** Exact-integer floor PageRank, 2 iterations, over the customer →
    * supplier purchase graph (supplier node ids offset by 1e6 to keep the
    * key spaces disjoint). The oracle replays BOTH iterations in DuckDB
    * CTEs — same base rank, same floor divisions, same ppm damping — so
    * the full iterative dataflow is pinned, not just the final shape.
    */
  /** Exact triangle counting (library: operators.TriangleCount,
    * degree-ordered orientation) over the co-purchase graph: parts are
    * linked when they appear in the same order. Output is the
    * triangle-participation histogram (tri_cnt → n_nodes) — small,
    * deterministic, and sensitive to any miscounted triangle; the
    * oracle replays orientation, wedge join, and closure check in
    * DuckDB with the same (degree, id) tiebreaks.
    */
  private def qTriangleCount(s: SparkSession, dir: String): DataFrame = {
    // Gate on a part-range SUBGRAPH (1-in-3 parts): the full co-purchase
    // graph is ~90 avg degree and wedge count grows with sum(d^2) — the
    // unbounded gate burned ~10^3 s of CPU at sf0.1 for zero extra oracle
    // power. The subgraph keeps every semantic branch (orientation ties,
    // closure, histogram) at ~1/27 the wedge volume; TriangleCountSpec
    // still proves the operator on dense random graphs.
    val li = T(s, dir).lineitem.select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 3 === 0)
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("pb"))
    val edges = a.join(b, col("ok") === col("ok2") && col("pa") < col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
    graft.operators.TriangleCount.perNode(edges)
      .groupBy("tri_cnt").agg(count(lit(1)).as("n_nodes"))
  }

  private def qPageRank(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val edges = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
      .distinct()
    graft.operators.PageRank.ranks(edges, iterations = 2)
  }

  private def qIncrementalJoin(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val oNew = t.orders.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long").as("o_total_cents"))
    val cNew = t.customer.select(
      col("c_custkey"), col("c_name"),
      round(col("c_acctbal") * 100).cast("long").as("c_acct_cents"))
    // Old snapshots: drop rows that become inserts, mutate rows that become
    // updates, add synthetic old-only keys that become deletes.
    val oOld = oNew.filter(col("o_orderkey") % 11 =!= 3)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 13 === 0, lit("0-STALE"))
          .otherwise(col("o_orderpriority")))
      .unionByName(oNew.filter(col("o_orderkey") % 19 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
    val cOld = cNew.filter(col("c_custkey") % 5 =!= 2)
      .withColumn("c_acct_cents",
        when(col("c_custkey") % 7 === 0, col("c_acct_cents") + 1L)
          .otherwise(col("c_acct_cents")))
      .unionByName(cNew.filter(col("c_custkey") % 9 === 0)
        .withColumn("c_custkey", col("c_custkey") + 100000000L))
    val dO = graft.operators.SnapshotDiff.diff(oOld, oNew, keys = Seq("o_orderkey"),
      attrs = Seq("o_custkey", "o_orderpriority", "o_total_cents"))
    val dC = graft.operators.SnapshotDiff.diff(cOld, cNew, keys = Seq("c_custkey"),
      attrs = Seq("c_name", "c_acct_cents"))
    val view = oOld.join(cOld, col("o_custkey") === col("c_custkey"))
    graft.operators.IncrementalJoin.mergeJoinView(
      view,
      oOld, dO, aKeys = Seq("o_orderkey"),
      cOld, dC, bKeys = Seq("c_custkey"),
      on = Seq("o_custkey" -> "c_custkey"))
  }

  /** Bloom-prefiltered semi join (library: operators.BloomPrefilter):
    * lineitem rows whose part is oversized, pruned by a broadcast bitset
    * before the exact semi join. The composition is exact (no false
    * negatives; the exact join kills the false positives), so the oracle
    * is plain EXISTS.
    */
  private def qBloomSemi(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    graft.operators.BloomPrefilter.semiJoin(
      t.lineitem, col("l_partkey"),
      t.part.filter(col("p_size") >= 48).select("p_partkey"), col("p_partkey"),
      numBits = 1 << 16, numHashes = 5)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"), sumCents(col("l_extendedprice")).as("price_cents"))
      .orderBy("l_returnflag")
  }

  /** Bloom-prefiltered anti join: bloom-definite non-members bypass the
    * join entirely; only might-members reach the exact anti join. Oracle:
    * NOT EXISTS.
    */
  private def qBloomAnti(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    graft.operators.BloomPrefilter.antiJoin(
      t.lineitem, col("l_partkey"),
      t.part.filter(col("p_size") >= 48).select("p_partkey"), col("p_partkey"),
      numBits = 1 << 16, numHashes = 5)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n_lines"), sumCents(col("l_extendedprice")).as("price_cents"))
      .orderBy("l_linestatus")
  }

  /** A9: exact interpolated percentiles. */
  private def qPercentiles(s: SparkSession, dir: String): DataFrame =
    T(s, dir).lineitem.agg(
      percentile(col("l_quantity"), lit(0.5)).as("p50"),
      percentile(col("l_quantity"), lit(0.9)).as("p90"),
      count(lit(1)).as("n")
    )

  /** A4 at-scale variant: HLL sketches (no DuckDB oracle — estimates are
    * engine-specific; the driver's rows-only check applies).
    */
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    // Oracle-checkable approximation contract (was: rows-only): the exact
    // counts hash-compare against DuckDB, and the HLL/KLL estimates are
    // gated by error bands computed IN the query — the oracle's side of a
    // band column is literal `true`, so an estimate drifting out of band
    // fails the driver compare. Bands: ±15% for approx_count_distinct
    // (default rsd 5% ⇒ 3σ; worst observed across SFs 6.4%), and the
    // approx median must land between the exact 45th/55th percentiles.
    // NOTE (round-16): spreading this single-row-group scan was measured
    // and REVERTED — the 3× Expand × (two exact-percentile buffers + two
    // HLL sketches) multiplies total work ~10× under partitioning (cpu
    // 7 → 90 s) for no wall win; the 1-partition agg is the cheaper plan.
    T(s, dir).lineitem.agg(
      approx_count_distinct(col("l_partkey")).as("__apx_parts"),
      countDistinct(col("l_partkey")).as("n_parts"),
      approx_count_distinct(col("l_orderkey")).as("__apx_orders"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("__apx_median"),
      // ONE percentile agg evaluating both band edges (the two separate
      // percentile calls were the #2 bench line — each is its own
      // sort-accumulating buffer over the full column)
      expr("percentile(l_extendedprice, array(0.45e0, 0.55e0))").as("__p"),
      count(lit(1)).as("n")
    ).select(
      col("n_parts"), col("n_orders"), col("n"),
      (col("__apx_parts") * lit(100L)).between(
        col("n_parts") * lit(85L), col("n_parts") * lit(115L)).as("parts_in_band"),
      (col("__apx_orders") * lit(100L)).between(
        col("n_orders") * lit(85L), col("n_orders") * lit(115L)).as("orders_in_band"),
      col("__apx_median").between(col("__p")(0), col("__p")(1)).as("median_in_band"))

  /** Beyond-reference: hierarchical subtotals via ROLLUP (the reference
    * computes per-level aggregates in separate jobs; one rollup pass
    * replaces them).
    */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    T(s, dir).orders
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), sumCents(col("o_totalprice")).as("total_cents"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Beyond-reference: CUBE (all grouping-set combinations in one pass);
    * `grouping()` markers disambiguate subtotal NULLs from data NULLs.
    */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    T(s, dir).orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        sumCents(col("o_totalprice")).as("total_cents"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))

  /** Beyond-reference: EXCEPT / INTERSECT set operators. */
  private def qExceptIntersect(s: SparkSession, dir: String): DataFrame = {
    val t       = T(s, dir)
    val ordered = t.orders.select(col("o_custkey").as("k")).distinct()
    val big     = t.customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    ordered.intersect(big).withColumn("op", lit("both"))
      .unionByName(ordered.except(big).withColumn("op", lit("ordered_only")))
  }

  // ===========================================================================
  // Contract maps
  // ===========================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExtensionQueries.queries ++ TpchQueries.queries ++ parityQueries

  // package-visible so ContractSpec can prove the merge with
  // ExtensionQueries.queries is collision-free
  private[graft] def parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_a1_pricing_summary"   -> (qPricingSummary _),
    "q_a2_conditional_agg"   -> (qConditionalAgg _),
    "q_a3_top_brands"        -> (qTopBrands _),
    "q_a4_distinct_counts"   -> (qDistinctCounts _),
    "q_a5_scalar_stats"      -> (qScalarStats _),
    "q_a6_classify_freq"     -> (qEventTypeClasses _),
    "q_w1_dedup_latest"      -> (qDedupLatest _),
    "q_w2_lag_changes"       -> (qLagChanges _),
    "q_w3_scd2_intervals"    -> (qScd2Intervals _),
    "q_w4_surrogate_keys"    -> (qSurrogateKeys _),
    "q_w4b_surrogate_keys_scalable" -> (qSurrogateKeysScalable _),
    "q_w5_yoy_growth"        -> (qYoyGrowth _),
    "q_w6_pct_of_total"      -> (qPctOfTotal _),
    "q_w7_trailing_window"   -> (qTrailingWindow _),
    "q_j1_enrich_defaults"   -> (qEnrichDefaults _),
    "q_j2_filter_existing"   -> (qFilterExisting _),
    "q_j3_sk_lookup"         -> (qSkLookup _),
    "q_j4_fk_integrity"      -> (qFkIntegrity _),
    "q_j5_scd2_incremental"  -> (qScd2Incremental _),
    "q_j7_zscore_daily"      -> (qZscoreDaily _),
    "q_s1_csv_contract"      -> (qCsvContract _),
    "q_s12_orc_roundtrip"    -> (qOrcRoundtrip _),
    "q_s13_json_lines"       -> (qJsonLines _),
    "q_s14_schema_evolution" -> (qSchemaEvolution _),
    "q_s4_json_extract"      -> (qJsonExtract _),
    "q_s5_inmemory_union"    -> (qInmemoryUnion _),
    "q_u1_union_subsets"     -> (qUnionSubsets _),
    "q_u3_distinct_pairs"    -> (qDistinctPairs _),
    "q_u4_dropdup_subset"    -> (qDropDupSubset _),
    "q_p5_validation_tagged" -> (qValidationTagged _),
    "q_p6_validation_rejects" -> (qValidationRejects _),
    "q_p9_bool_parse"        -> (qBoolParse _),
    "q_p10_impute_flag"      -> (qImputeFlag _),
    "q_p11_backfill_fact"    -> (qBackfillFact _),
    "q_f_string_funcs"       -> (qStringFuncs _),
    "q_f_datetime_funcs"     -> (qDatetimeFuncs _),
    "q_f_explode_words"      -> (qExplodeWords _),
    "q_gold_dim_date"        -> (qDimDate _),
    "q_gold_fact_daily"      -> (qGoldFactDaily _),
    "q_gold_publish_jdbc"    -> (qGoldPublishJdbc _),
    "q_o_stream_window_replay" -> (qStreamWindowReplay _),
    "q_o_stream_append_replay" -> (qStreamAppendReplay _),
    "q_o_stream_dedup_replay"  -> (qStreamDedupReplay _),
    "q_o_stream_session_replay" -> (qStreamSessionReplay _),
    "q_o_stream_running_stats" -> (qStreamRunningStats _),
    "q_o_stream_txlog_sink"  -> (qStreamTxLogSink _),
    "q_o_stream_txlog_sink_fmt" -> (qStreamTxLogSinkFmt _),
    "q_o_stream_custom_session" -> (qStreamCustomSession _),
    "q_o_stream_txlog_source" -> (qStreamTxLogSource _),
    "q_o_stream_txlog_incremental" -> (qStreamTxLogIncremental _),
    "q_o_stream_txlog_partition" -> (qStreamTxLogPartition _),
    "q_o_stream_txlog_rename" -> (qStreamTxLogRename _),
    "q_o_stream_txlog_pipeline" -> (qStreamTxLogPipeline _),
    "q_o_stream_txlog_cdf" -> (qStreamTxLogCdf _),
    "q_o_stream_static_enrich" -> (qStreamStaticEnrich _),
    "q_o_stream_join_replay" -> (qStreamJoinReplay _),
    "q_o_stream_late_replay" -> (qStreamLateReplay _),
    "q_o_stream_outer_replay" -> (qStreamOuterReplay _),
    "q_o_triangle_count"     -> (qTriangleCount _),
    "q_gold_scd2_dim"        -> (qGoldScd2Dim _),
    "q_o_asof_join"          -> (qAsOfJoin _),
    "q_o_asof_forward"       -> (qAsOfForward _),
    "q_o_range_join"         -> (qRangeJoin _),
    "q_o_range_join_auto"    -> (qRangeJoinAuto _),
    "q_o_range_join_strict"  -> (qRangeJoinStrict _),
    "q_o_interval_overlap"   -> (qIntervalOverlap _),
    "q_o_scd2_pit"           -> (qScd2PitLookup _),
    "q_o_salted_join"        -> (qSaltedJoin _),
    "q_o_snapshot_diff"      -> (qSnapshotDiff _),
    "q_o_snapshot_apply"     -> (qSnapshotApply _),
    "q_o_incr_agg"           -> (qIncrementalAgg _),
    "q_o_retractable_agg"    -> (qRetractableAgg _),
    "q_o_retractable_distinct" -> (qRetractableDistinct _),
    "q_o_incr_join"          -> (qIncrementalJoin _),
    "q_o_pagerank"           -> (qPageRank _),
    "q_o_bloom_semi"         -> (qBloomSemi _),
    "q_o_bloom_anti"         -> (qBloomAnti _),
    "q_a9_percentiles"       -> (qPercentiles _),
    "q_a4b_approx_distinct"  -> (qApproxDistinct _),
    "q_a10_rollup"           -> (qRollup _),
    "q_a10b_cube"            -> (qCube _),
    "q_w9_range_frame"       -> (qRangeFrame _),
    "q_o_gap_fill"           -> (qGapFill _),
    "q_a9b_group_percentiles" -> (qGroupPercentiles _),
    "q_tpch_q3_shipping"     -> (qShippingPriority _),
    "q_tpch_q5_local_volume" -> (qLocalSupplierVolume _),
    "q_tpch_q10_returned"    -> (qReturnedItems _),
    "q_tpch_q8_mktshare"     -> (qMarketShare _),
    "q_dq_profile"           -> (qProfile _),
    "q_a11_group_topk"       -> (qGroupTopK _),
    "q_a12_histogram"        -> (qHistogram _),
    "q_u5_except_intersect"  -> (qExceptIntersect _),
    "q_w8_sessionize"        -> (qSessionize _),
    "q_a2b_pivot"            -> (qPivot _),
    "q_sql_dup_keys"         -> (graft.sqlfront.SqlFront.duplicateKeys _),
    "q_sql_distribution"     -> (graft.sqlfront.SqlFront.distribution _),
    "q_sql_freshness"        -> (graft.sqlfront.SqlFront.freshness _),
    "q_sql_anomaly_zscore"   -> ((s: SparkSession, dir: String) =>
      graft.sqlfront.SqlFront.recordCountAnomaly(s, dir, "2024-01-30")),
    "q_sql_dup_rate_spike"   -> ((s: SparkSession, dir: String) =>
      graft.sqlfront.SqlFront.duplicateRateSpike(s, dir, "2024-01-30"))
  )

  def oracleSql: Map[String, String] = {
    val m = ExtensionQueries.oracleSql ++ TpchQueries.oracleSql ++ parityOracleSql
    // scalable-mode SKs are value-identical to reference mode under a total
    // ordering — the whole point; the two queries share one oracle
    m + ("q_w4b_surrogate_keys_scalable" -> m("q_w4_surrogate_keys"))
  }

  private def parityOracleSql: Map[String, String] = Map(
    "q_a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS sum_disc_cents,
        |  SUM(ROUND(l_discount*100))/COUNT(*)/100 AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_a2_conditional_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS total_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_orders,
        |  CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_a3_top_brands" ->
      """SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
        |ORDER BY cnt DESC, p_brand LIMIT 10""".stripMargin,
    "q_a4_distinct_counts" ->
      """SELECT COUNT(DISTINCT c_mktsegment) AS n_segments,
        |  COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_rows
        |FROM customer""".stripMargin,
    // exact counts replicated; the approximation-band columns are computed
    // Spark-side against Spark-exact references, so the oracle's side of
    // each band is literal true — an out-of-band estimate hash-mismatches
    "q_a4b_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n,
        |  true AS parts_in_band, true AS orders_in_band, true AS median_in_band
        |FROM lineitem""".stripMargin,
    "q_a5_scalar_stats" ->
      """SELECT MAX(l_orderkey) AS max_orderkey, MIN(l_shipdate) AS min_shipdate,
        |  MAX(l_quantity) AS max_qty, COUNT(DISTINCT l_suppkey) AS n_suppliers
        |FROM lineitem""".stripMargin,
    "q_a6_classify_freq" ->
      """WITH c AS (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)
        |SELECT event_type, cnt,
        |  CASE WHEN cnt*1000 >= CAST(SUM(cnt) OVER () AS BIGINT)*200 THEN 'popular'
        |       WHEN cnt*1000 >= CAST(SUM(cnt) OVER () AS BIGINT)*199 THEN 'common'
        |       ELSE 'rare' END AS category
        |FROM c ORDER BY event_type""".stripMargin,
    "q_w1_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value, ts FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "q_w2_lag_changes" ->
      """SELECT user_id, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  event_type IS DISTINCT FROM lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS changed
        |FROM events""".stripMargin,
    "q_w3_scd2_intervals" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev_ts
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM w
        |      WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS effective_start_ts,
        |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type),
        |           TIMESTAMP '9999-12-31 00:00:00') AS effective_end_ts,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL AS is_current
        |FROM v""".stripMargin,
    "q_gold_scd2_dim" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev_ts
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM w
        |      WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type),
        |dim AS (
        |  SELECT user_id, event_type, ts AS effective_start_ts,
        |    coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type),
        |             TIMESTAMP '9999-12-31 00:00:00') AS effective_end_ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL AS is_current
        |  FROM v)
        |SELECT user_id, event_type, effective_start_ts, effective_end_ts, is_current,
        |  row_number() OVER (ORDER BY effective_start_ts, user_id) AS dim_sk
        |FROM dim""".stripMargin,
    "q_s12_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_cents
        |FROM supplier""".stripMargin,
    "q_s13_json_lines" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""".stripMargin,
    // generation 1 lacks n_regionkey -> NULL under mergeSchema
    "q_s14_schema_evolution" ->
      """SELECT 1 AS g, n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
        |FROM nation
        |UNION ALL
        |SELECT 2 AS g, n_nationkey, n_name, n_regionkey FROM nation""".stripMargin,
    "q_o_scd2_pit" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev_ts
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM w
        |      WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type),
        |dim AS (
        |  SELECT user_id, event_type, ts AS s,
        |    coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type),
        |             TIMESTAMP '9999-12-31 00:00:00') AS e
        |  FROM v),
        |f AS (SELECT user_id, event_id, ts AS purchase_ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id, f.purchase_ts,
        |  d.event_type AS prior_state, d.s AS state_start_ts
        |FROM f LEFT JOIN dim d
        |  ON f.user_id = d.user_id
        | AND f.purchase_ts - INTERVAL 1 MICROSECOND >= d.s
        | AND f.purchase_ts - INTERVAL 1 MICROSECOND < d.e""".stripMargin,
    "q_o_range_join" ->
      """WITH bands AS (SELECT CAST(i AS INTEGER) AS band_id,
        |    CAST(89000 + i*500 AS BIGINT) AS lo_cents,
        |    CAST(89000 + i*500 + 1999 AS BIGINT) AS hi_cents
        |  FROM range(24) t(i)),
        |pts AS (SELECT p_partkey,
        |    CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_cents FROM part)
        |SELECT band_id, p_partkey, price_cents, lo_cents, hi_cents
        |FROM pts JOIN bands
        |  ON price_cents >= lo_cents AND price_cents <= hi_cents""".stripMargin,
    "q_o_asof_forward" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |  CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY THEN p.event_id END AS next_purchase_id,
        |  CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY THEN p.value END AS next_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
        |                WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts""".stripMargin,
    // identical semantics to q_o_range_join — the Spark side differs only
    // in HOW the plan is produced (optimizer rule vs explicit operator)
    "q_o_range_join_auto" ->
      """WITH bands AS (SELECT CAST(i AS INTEGER) AS band_id,
        |    CAST(89000 + i*500 AS BIGINT) AS lo_cents,
        |    CAST(89000 + i*500 + 1999 AS BIGINT) AS hi_cents
        |  FROM range(24) t(i)),
        |pts AS (SELECT p_partkey,
        |    CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_cents FROM part)
        |SELECT band_id, p_partkey, price_cents, lo_cents, hi_cents
        |FROM pts JOIN bands
        |  ON price_cents >= lo_cents AND price_cents <= hi_cents""".stripMargin,
    // strict bounds + zero-straddling values: residual filter + signed
    // floor-division bucketing are what the oracle pins here
    "q_o_range_join_strict" ->
      """WITH bands AS (SELECT CAST(i AS INTEGER) AS band_id,
        |    CAST(-6000 + i*500 AS BIGINT) AS lo_cents,
        |    CAST(-6000 + i*500 + 2000 AS BIGINT) AS hi_cents
        |  FROM range(24) t(i)),
        |pts AS (SELECT p_partkey,
        |    CAST(ROUND(p_retailprice*100) AS BIGINT) - 95000 AS price_cents
        |  FROM part)
        |SELECT band_id, p_partkey, price_cents, lo_cents, hi_cents
        |FROM pts JOIN bands
        |  ON price_cents > lo_cents AND price_cents < hi_cents""".stripMargin,
    "q_o_interval_overlap" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS sd
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
        |  a.sd AS lo_a, a.sd + 30 AS hi_a, b.sd AS lo_b, b.sd + 30 AS hi_b
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND a.sd <= b.sd + 30 AND b.sd <= a.sd + 30""".stripMargin,
    "q_o_salted_join" ->
      """SELECT p_brand, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_o_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |  FROM orders),
        |b AS (SELECT * FROM base WHERE o_orderkey % 5 <> 0),
        |a AS (SELECT o_orderkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 3 = 0 THEN price_cents + 500
        |             ELSE price_cents END AS price_cents
        |      FROM base WHERE o_orderkey % 7 <> 0)
        |SELECT * FROM (
        |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN a.o_orderkey IS NOT NULL THEN a.o_orderstatus
        |         ELSE b.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN a.o_orderkey IS NOT NULL THEN a.price_cents
        |         ELSE b.price_cents END AS price_cents,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |         WHEN a.o_orderkey IS NULL THEN 'delete'
        |         WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |           OR a.price_cents IS DISTINCT FROM b.price_cents THEN 'update'
        |         ELSE 'unchanged' END AS change_type
        |  FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey)
        |WHERE change_type <> 'unchanged'""".stripMargin,
    "q_o_snapshot_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 3 = 0 THEN price_cents + 500
        |       ELSE price_cents END AS price_cents
        |FROM base WHERE o_orderkey % 7 <> 0""".stripMargin,
    "q_o_incr_agg" ->
      """SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL ELSE o_custkey END AS grp,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents,
        |  MIN(CAST(o_orderdate AS DATE)) AS first_order,
        |  MAX(CAST(o_orderdate AS DATE)) AS last_order,
        |  MAX(CASE WHEN o_orderpriority = '1-URGENT'
        |           THEN CAST(o_orderdate AS DATE) END) AS last_urgent
        |FROM orders GROUP BY 1""".stripMargin,
    // maintained-under-deletes aggregate == full recompute over
    // base ∪ inserts ∖ deletes — the view-maintenance invariant
    "q_o_retractable_agg" ->
      """WITH nb AS (SELECT l_returnflag, l_linestatus,
        |    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
        |  FROM lineitem WHERE l_orderkey % 10 <> 3)
        |SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(price_cents) AS BIGINT) AS price_cents,
        |  MIN(price_cents) AS min_price_cents,
        |  MAX(price_cents) AS max_price_cents
        |FROM nb GROUP BY 1, 2""".stripMargin,
    "q_o_retractable_distinct" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        |FROM lineitem WHERE l_orderkey % 10 <> 3
        |GROUP BY 1""".stripMargin,
    // replays BOTH floor-PageRank iterations: same integer base rank,
    // same per-edge floor division, same ppm damping update
    "q_o_pagerank" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |outd AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |b AS (SELECT 1000000000000 // count(*) AS base FROM nodes),
        |r0 AS (SELECT id, (SELECT base FROM b) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS id, sum(r0.r // outd.d) AS s
        |       FROM e JOIN r0 ON e.src = r0.id JOIN outd ON e.src = outd.src
        |       GROUP BY 1),
        |r1 AS (SELECT nodes.id,
        |         (150000 * (SELECT base FROM b) + 850000 * coalesce(c1.s, 0))
        |           // 1000000 AS r
        |       FROM nodes LEFT JOIN c1 ON nodes.id = c1.id),
        |c2 AS (SELECT e.dst AS id, sum(r1.r // outd.d) AS s
        |       FROM e JOIN r1 ON e.src = r1.id JOIN outd ON e.src = outd.src
        |       GROUP BY 1),
        |r2 AS (SELECT nodes.id,
        |         (150000 * (SELECT base FROM b) + 850000 * coalesce(c2.s, 0))
        |           // 1000000 AS r
        |       FROM nodes LEFT JOIN c2 ON nodes.id = c2.id)
        |SELECT id, CAST(r AS BIGINT) AS r FROM r2""".stripMargin,
    "q_o_incr_join" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS o_total_cents,
        |  c_custkey, c_name,
        |  CAST(ROUND(c_acctbal*100) AS BIGINT) AS c_acct_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_o_bloom_semi" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        |  CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part
        |              WHERE p_partkey = l_partkey AND p_size >= 48)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_o_bloom_anti" ->
      """SELECT l_linestatus, COUNT(*) AS n_lines,
        |  CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM part
        |                  WHERE p_partkey = l_partkey AND p_size >= 48)
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_j5_scd2_incremental" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev_ts
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM w
        |      WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS effective_start_ts,
        |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type),
        |           TIMESTAMP '9999-12-31 00:00:00') AS effective_end_ts,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL AS is_current
        |FROM v""".stripMargin,
    "q_w4_surrogate_keys" ->
      """SELECT c_custkey, 1000 + row_number() OVER (ORDER BY c_custkey) AS customer_sk
        |FROM customer""".stripMargin,
    "q_w5_yoy_growth" ->
      """WITH y AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS cnt,
        |    CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents
        |  FROM orders GROUP BY 1)
        |SELECT yr, cnt, total_cents,
        |  lag(cnt) OVER (ORDER BY yr) AS prev_cnt,
        |  CASE WHEN lag(cnt) OVER (ORDER BY yr) IS NOT NULL
        |       THEN (cnt - lag(cnt) OVER (ORDER BY yr)) * 100.0 / lag(cnt) OVER (ORDER BY yr)
        |  END AS growth_pct
        |FROM y ORDER BY yr""".stripMargin,
    "q_w6_pct_of_total" ->
      """WITH c AS (SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, cnt,
        |  cnt * 100.0 / CAST(SUM(cnt) OVER () AS BIGINT) AS pct
        |FROM c ORDER BY o_orderstatus""".stripMargin,
    "q_w7_trailing_window" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        |           FROM orders GROUP BY 1)
        |SELECT order_date, cnt,
        |  CAST(SUM(cnt) OVER w AS BIGINT) AS trail_sum,
        |  COUNT(cnt) OVER w AS trail_n,
        |  CASE WHEN COUNT(cnt) OVER w > 0
        |       THEN SUM(cnt) OVER w * 1.0 / COUNT(cnt) OVER w END AS trail_avg
        |FROM d
        |WINDOW w AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
        |ORDER BY order_date""".stripMargin,
    "q_j1_enrich_defaults" ->
      """SELECT o_orderkey, o_custkey,
        |  COALESCE(c_name, 'Unknown') AS c_name,
        |  COALESCE(c_mktsegment, 'XX') AS c_mktsegment
        |FROM orders LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment FROM customer
        |                       WHERE c_custkey % 7 <> 0) c
        |  ON o_custkey = c_custkey""".stripMargin,
    "q_j2_filter_existing" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_size > 25)""".stripMargin,
    "q_j3_sk_lookup" ->
      """SELECT o_orderkey, o_custkey, COALESCE(customer_sk, 0) AS customer_sk
        |FROM orders LEFT JOIN (SELECT c_custkey, c_custkey + 1000 AS customer_sk
        |                       FROM customer WHERE c_custkey % 10 <> 0) c
        |  ON o_custkey = c_custkey""".stripMargin,
    "q_j4_fk_integrity" ->
      """SELECT DISTINCT l_suppkey AS sk FROM lineitem
        |WHERE l_suppkey <> 0
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_suppkey = l_suppkey AND s_suppkey <= 8)""".stripMargin,
    "q_j7_zscore_daily" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        |           FROM orders GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS s,
        |              CAST(SUM(cnt*cnt) AS BIGINT) AS ss FROM d)
        |SELECT order_date, cnt,
        |  (cnt - CAST(s AS DOUBLE)/n) / sqrt((ss - CAST(s*s AS DOUBLE)/n)/(n-1)) AS zscore
        |FROM d CROSS JOIN st ORDER BY order_date""".stripMargin,
    "q_s4_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT) AS k
        |FROM events
        |WHERE CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT) > 50""".stripMargin,
    "q_s5_inmemory_union" ->
      """SELECT CAST(-1 AS INTEGER) AS r_regionkey, 'UNKNOWN' AS r_name
        |UNION ALL SELECT r_regionkey, r_name FROM region
        |ORDER BY r_regionkey""".stripMargin,
    // Same CSV dialect (header, quote='"', escape='"'), same coercions
    // (try_strptime/TRY_CAST null-on-malformed), same first-match-wins rule
    // chain as BronzeIngest.ingest over Contracts.datasets.
    "q_s1_csv_contract" ->
      s"""WITH raw AS (
        |  SELECT * FROM read_csv('$CsvFixturePath',
        |    header=true, quote='"', escape='"',
        |    columns={'Id':'VARCHAR','Title':'VARCHAR','Subtitle':'VARCHAR',
        |             'CreatorUserId':'VARCHAR','TotalViews':'VARCHAR',
        |             'TotalDownloads':'VARCHAR','CreationDate':'VARCHAR',
        |             'LastUpdatedDate':'VARCHAR','Type':'VARCHAR','IsPrivate':'VARCHAR'})),
        |typed AS (
        |  SELECT Id AS dataset_id, Title AS dataset_title, Subtitle AS dataset_subtitle,
        |    CreatorUserId AS owner_user_id,
        |    TRY_CAST(TotalViews AS BIGINT) AS total_views, TotalViews AS raw_views,
        |    TRY_CAST(TotalDownloads AS BIGINT) AS total_downloads, TotalDownloads AS raw_downloads,
        |    try_strptime(CreationDate, '%Y-%m-%d %H:%M:%S') AS created_ts,
        |    try_strptime(LastUpdatedDate, '%Y-%m-%d %H:%M:%S') AS updated_ts,
        |    Type AS dataset_type,
        |    CASE WHEN upper(IsPrivate) = 'TRUE' THEN true
        |         WHEN upper(IsPrivate) = 'FALSE' THEN false END AS is_private
        |  FROM raw)
        |SELECT dataset_id, dataset_title, dataset_subtitle, owner_user_id,
        |  total_views, total_downloads, created_ts, updated_ts, dataset_type, is_private,
        |  '2024-06-01' AS run_date, 'contract_csv' AS source_system,
        |  CASE WHEN dataset_id IS NULL THEN 'dataset_id_is_null'
        |       WHEN trim(dataset_id) = '' THEN 'dataset_id_is_empty'
        |       WHEN dataset_title IS NULL THEN 'dataset_title_is_null'
        |       WHEN owner_user_id IS NULL THEN 'owner_user_id_is_null'
        |       WHEN total_views < 0 THEN 'total_views_negative'
        |       WHEN total_downloads < 0 THEN 'total_downloads_negative'
        |       WHEN updated_ts < created_ts THEN 'updated_ts_before_created_ts'
        |       WHEN total_views IS NULL AND trim(raw_views) <> '' THEN 'total_views_not_numeric'
        |       WHEN total_downloads IS NULL AND trim(raw_downloads) <> '' THEN 'total_downloads_not_numeric'
        |  END AS reject_reason
        |FROM typed""".stripMargin,
    "q_u1_union_subsets" ->
      """SELECT o_orderkey, o_orderpriority, 'hot' AS bucket FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority, 'cold' AS bucket FROM orders
        |WHERE o_orderpriority = '5-LOW'""".stripMargin,
    "q_u3_distinct_pairs" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q_u4_dropdup_subset" ->
      "SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem",
    "q_p5_validation_tagged" ->
      """SELECT c_custkey, c_acctbal,
        |  CASE WHEN c_name IS NULL THEN 'c_name_is_null'
        |       WHEN c_acctbal < 0 THEN 'c_acctbal_negative'
        |       WHEN trim(c_mktsegment) = '' THEN 'c_mktsegment_is_empty'
        |       WHEN c_acctbal > 9000 THEN 'c_acctbal_too_large'
        |  END AS reject_reason
        |FROM customer""".stripMargin,
    "q_p6_validation_rejects" ->
      """SELECT c_custkey, reject_reason FROM (
        |  SELECT c_custkey,
        |    CASE WHEN c_name IS NULL THEN 'c_name_is_null'
        |         WHEN c_acctbal < 0 THEN 'c_acctbal_negative'
        |         WHEN trim(c_mktsegment) = '' THEN 'c_mktsegment_is_empty'
        |         WHEN c_acctbal > 9000 THEN 'c_acctbal_too_large'
        |    END AS reject_reason
        |  FROM customer) WHERE reject_reason IS NOT NULL""".stripMargin,
    "q_p9_bool_parse" ->
      """SELECT event_id,
        |  CASE WHEN value > 150 THEN 'TRUE' WHEN value < 50 THEN 'FALSE'
        |       ELSE 'maybe' END AS flag_str,
        |  CASE WHEN upper(CASE WHEN value > 150 THEN 'TRUE' WHEN value < 50 THEN 'FALSE'
        |                       ELSE 'maybe' END) = 'TRUE' THEN true
        |       WHEN upper(CASE WHEN value > 150 THEN 'TRUE' WHEN value < 50 THEN 'FALSE'
        |                       ELSE 'maybe' END) = 'FALSE' THEN false
        |  END AS is_flag
        |FROM events""".stripMargin,
    "q_p10_impute_flag" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS segment,
        |  NULLIF(c_mktsegment, 'BUILDING') IS NULL AS segment_imputed
        |FROM customer""".stripMargin,
    // recompute fact_competitions_yearly per backfilled run date straight
    // from the raw CSV: every fixture row is valid, so bronze+silver are
    // typing-only and the fact is an agg over the typed rows × run dates
    "q_p11_backfill_fact" ->
      s"""WITH comps AS (
        |  SELECT try_strptime(StartDate, '%Y-%m-%d %H:%M:%S') AS start_ts,
        |         try_strptime(Deadline, '%Y-%m-%d %H:%M:%S') AS deadline_ts,
        |         CAST(PrizeMoney AS DOUBLE) AS prize_money
        |  FROM read_csv('$BackfillFixtureDir/competitions.csv', header=true,
        |    columns={'Id':'VARCHAR','Title':'VARCHAR','Category':'VARCHAR',
        |             'StartDate':'VARCHAR','Deadline':'VARCHAR','PrizeMoney':'VARCHAR'})),
        |rd AS (SELECT unnest(['2024-06-01','2024-06-02']) AS run_date)
        |SELECT rd.run_date, CAST(year(start_ts) AS INTEGER) AS year,
        |  count(*) AS competitions_count,
        |  CAST(sum(CASE WHEN deadline_ts >= CAST(rd.run_date AS TIMESTAMP)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS active_competitions_count,
        |  avg(prize_money) AS avg_prize
        |FROM comps CROSS JOIN rd
        |GROUP BY 1, 2""".stripMargin,
    "q_f_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS name_lower,
        |  regexp_replace(lower(p_type), '[^a-z]', '', 'g') AS type_alpha,
        |  trim(upper(p_brand)) AS brand_up,
        |  CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part""".stripMargin,
    "q_f_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mth,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30d
        |FROM orders""".stripMargin,
    "q_f_explode_words" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part""",
    "q_gold_dim_date" ->
      """WITH d AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
        |                                              INTERVAL 1 DAY)) AS DATE) AS date)
        |SELECT CAST(year(date)*10000 + month(date)*100 + day(date) AS INTEGER) AS date_sk,
        |  date,
        |  CAST(year(date) AS INTEGER) AS year,
        |  CAST(quarter(date) AS INTEGER) AS quarter,
        |  CAST(month(date) AS INTEGER) AS month,
        |  CAST(day(date) AS INTEGER) AS day_of_month,
        |  CAST(dayofyear(date) AS INTEGER) AS day_of_year,
        |  CAST(weekofyear(date) AS INTEGER) AS week_of_year,
        |  CAST(dayofweek(date) + 1 AS INTEGER) AS day_of_week,
        |  CAST(isodow(date) AS INTEGER) AS iso_dow,
        |  isodow(date) >= 6 AS is_weekend,
        |  isodow(date) < 6 AS is_weekday,
        |  printf('%d%02d', year(date), month(date)) AS year_month,
        |  ((month(date) = 1 AND day(date) = 1) OR (month(date) = 4 AND day(date) = 30)
        |   OR (month(date) = 5 AND day(date) = 1) OR (month(date) = 9 AND day(date) = 2))
        |    AS is_holiday,
        |  CAST(CASE WHEN month(date) >= 7 THEN year(date) ELSE year(date) - 1 END
        |       AS INTEGER) AS fiscal_year,
        |  CAST(((month(date) + 5) % 12) // 3 + 1 AS INTEGER) AS fiscal_quarter,
        |  CAST(CASE WHEN month(date) IN (1,3,5,7,8,10,12) THEN 31
        |            WHEN month(date) IN (4,6,9,11) THEN 30
        |            WHEN month(date) = 2 AND year(date) % 4 = 0
        |                 AND (year(date) % 100 != 0 OR year(date) % 400 = 0) THEN 29
        |            ELSE 28 END AS INTEGER) AS days_in_month
        |FROM d""".stripMargin,
    "q_o_gap_fill" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        |           FROM orders GROUP BY 1),
        |b AS (SELECT MIN(order_date) AS lo, MAX(order_date) AS hi FROM d),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |            AS order_date FROM b)
        |SELECT spine.order_date, COALESCE(d.cnt, 0) AS cnt,
        |  COALESCE(d.cnt, 0) = 0 AS is_gap
        |FROM spine LEFT JOIN d ON spine.order_date = d.order_date
        |ORDER BY spine.order_date""".stripMargin,
    "q_a9b_group_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q3_shipping" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q5_local_volume" ->
      """SELECT n_name,
        |  CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q_tpch_q10_returned" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q8_mktshare" ->
      """WITH b AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
        |    CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS vol_cents,
        |    n2.n_name AS supp_nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |    AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |    AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'),
        |g AS (SELECT o_year,
        |    CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_2'
        |                           THEN vol_cents END), 0) AS BIGINT) AS nation_cents,
        |    CAST(SUM(vol_cents) AS BIGINT) AS total_cents
        |  FROM b GROUP BY 1)
        |SELECT o_year, nation_cents, total_cents,
        |  CAST(nation_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS mkt_share
        |FROM g ORDER BY o_year""".stripMargin,
    "q_a11_group_topk" ->
      """WITH r AS (
        |  SELECT p_brand, p_partkey,
        |    CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue_cents FROM r
        |QUALIFY row_number() OVER (
        |  PARTITION BY p_brand ORDER BY revenue_cents DESC, p_partkey) <= 3""".stripMargin,
    "q_a12_histogram" ->
      """WITH c AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT cents,
        |        least(11, greatest(0, CAST(floor(cents * 12 / 60000000) AS BIGINT))) AS bin
        |      FROM c)
        |SELECT bin, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total,
        |  bin * 5000000 AS bin_lo
        |FROM b GROUP BY bin""".stripMargin,
    "q_dq_profile" -> Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      .map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_value,
           |  CAST(MAX($c) AS VARCHAR) AS max_value FROM customer""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q_w9_range_frame" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1)
        |SELECT order_date,
        |  CAST(date_diff('day', DATE '1970-01-01', order_date) AS INTEGER) AS day_idx,
        |  cnt,
        |  CAST(SUM(cnt) OVER (ORDER BY date_diff('day', DATE '1970-01-01', order_date)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS range_sum
        |FROM d ORDER BY order_date""".stripMargin,
    "q_a10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_a10b_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_u5_except_intersect" ->
      """WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |b AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT k, 'both' AS op FROM (SELECT k FROM o INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT k, 'ordered_only' AS op FROM (SELECT k FROM o EXCEPT SELECT k FROM b)""".stripMargin,
    "q_w8_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |        CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM m)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q_a2b_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sql_dup_keys" ->
      """SELECT user_id, COUNT(*) AS n_rows
        |FROM events GROUP BY user_id HAVING COUNT(*) > 1""".stripMargin,
    // the reference's record-count z-score CTE chain over daily events,
    // rounded to 6dp on both engines (derived double stats)
    "q_sql_anomaly_zscore" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS run_date, COUNT(*) AS record_count
        |           FROM events
        |           WHERE CAST(ts AS DATE) >= DATE '2024-01-30' - 7
        |             AND CAST(ts AS DATE) <= DATE '2024-01-30'
        |           GROUP BY 1),
        |s AS (SELECT AVG(record_count) AS avg_count,
        |        STDDEV(record_count) AS std_count
        |      FROM d WHERE run_date < DATE '2024-01-30')
        |SELECT d.run_date, d.record_count,
        |  round(s.avg_count, 6) AS avg_count,
        |  round(s.std_count, 6) AS std_count,
        |  round(ABS(d.record_count - s.avg_count) / s.std_count, 6) AS z_score
        |FROM d CROSS JOIN s
        |WHERE d.run_date = DATE '2024-01-30'""".stripMargin,
    // the reference's duplicate-rate spike check; its outer WHERE runs
    // before the window, so the trailing frame is empty -> NULL avg rate
    // (faithfully reproduced by both engines)
    "q_sql_dup_rate_spike" ->
      """WITH ds AS (SELECT CAST(ts AS DATE) AS run_date,
        |    COUNT(*) AS total_records,
        |    COUNT(DISTINCT user_id) AS unique_users,
        |    (COUNT(*) - COUNT(DISTINCT user_id)) * 100.0 / COUNT(*) AS duplicate_rate
        |  FROM events
        |  WHERE CAST(ts AS DATE) >= DATE '2024-01-30' - 7
        |    AND CAST(ts AS DATE) <= DATE '2024-01-30'
        |  GROUP BY 1)
        |SELECT run_date,
        |  CAST(round(duplicate_rate, 6) AS DOUBLE) AS duplicate_rate,
        |  CAST(round(AVG(duplicate_rate) OVER (ORDER BY run_date
        |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 6) AS DOUBLE) AS avg_dup_rate
        |FROM ds
        |WHERE run_date = DATE '2024-01-30'""".stripMargin,
    "q_sql_distribution" ->
      """WITH c AS (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |           GROUP BY o_orderpriority)
        |SELECT o_orderpriority, cnt,
        |  ROUND(cnt * 100e0 / CAST(SUM(cnt) OVER () AS BIGINT), 2) AS pct
        |FROM c ORDER BY o_orderpriority""".stripMargin,
    "q_sql_freshness" ->
      """SELECT 'orders' AS table_name, CAST(MAX(o_orderdate) AS DATE) AS latest FROM orders
        |UNION ALL
        |SELECT 'lineitem', CAST(MAX(l_shipdate) AS DATE) FROM lineitem
        |UNION ALL
        |SELECT 'events', CAST(MAX(ts) AS DATE) FROM events""".stripMargin,
    // explicit row_number formulation instead of DuckDB's ASOF: ASOF has no
    // defined tie-break when several purchases share the greatest ts <= e.ts
    // (possible after ns->us truncation); (ts DESC, pid DESC) = 1 matches
    // AsOfJoin's rightTiebreak semantics (largest pid wins) exactly
    "q_o_asof_join" ->
      """SELECT event_id, user_id, ts, event_type,
        |  purchase_event_id, last_purchase_value
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts, e.event_type,
        |    p.pid AS purchase_event_id, p.value AS last_purchase_value,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY p.ts DESC, p.pid DESC) AS rn
        |  FROM events e LEFT JOIN
        |    (SELECT user_id, ts, event_id AS pid, value FROM events
        |     WHERE event_type = 'purchase') p
        |    ON e.user_id = p.user_id AND e.ts >= p.ts)
        |WHERE rn = 1""".stripMargin,
    "q_a9_percentiles" ->
      """SELECT quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90, COUNT(*) AS n
        |FROM lineitem""".stripMargin,
    "q_gold_fact_daily" ->
      """WITH daily AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        |    COUNT(*) AS orders_count,
        |    CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
        |    CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, COALESCE(customer_sk, 0) AS customer_sk, order_date,
        |  orders_count, open_count, total_cents
        |FROM daily LEFT JOIN (SELECT c_custkey, c_custkey + 1000 AS customer_sk
        |                      FROM customer WHERE c_custkey % 10 <> 0) c
        |  ON o_custkey = c_custkey""".stripMargin,
    // batch twin of the streamed tumbling windows: epoch-aligned 1-day
    // buckets, exact cents; CASTs pin microsecond TIMESTAMP (the events
    // view is TIMESTAMP_NS in DuckDB)
    "q_o_stream_window_replay" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
        |  event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // stateful-dedup replay: the salted duplicates must all be dropped,
    // so the oracle is the pre-salt events table itself
    "q_o_stream_dedup_replay" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        |FROM events""".stripMargin,
    // session-window replay: gap-islands sessionization. Spark's
    // session_window merges on overlap-or-ADJACENCY (an event at exactly
    // gap distance extends the session — spec-pinned), hence > on the
    // break, the same boundary as the batch Sessionize/q_w8
    "q_o_stream_session_replay" ->
      """WITH m AS (
        |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             > INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |g AS (SELECT user_id, ts, cents,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS value_cents
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // custom-state sessionization: the SAME gap-islands twin as the
    // session_window gate — the two implementations pin each other
    "q_o_stream_custom_session" ->
      """WITH m AS (
        |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             > INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |g AS (SELECT user_id, ts, cents,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS value_cents
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // TxLog streaming source: every committed row exactly once (the
    // planted orphan slice would double event_id%3=0 counts)
    "q_o_stream_txlog_source" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
        |  event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // incremental TxLog source with mid-log stop/restart: the resumed
    // query's final state must still be every committed row exactly once
    "q_o_stream_txlog_incremental" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
        |  event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // partition-filtered stream: exactly bucket 2's rows across every
    // version; the foreign partition delete passed as an empty batch
    "q_o_stream_txlog_partition" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
        |FROM events WHERE event_id % 4 = 2
        |GROUP BY event_type""".stripMargin,
    // stream across rename boundaries: phase 'pre' = id%3=0 rows served
    // under the first rename's name, phase 'post' = the restarted run's
    // id%3=1 rows under the second rename's name; names Spark-bound
    "q_o_stream_txlog_rename" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_cents,
        |  'pre' AS phase, TRUE AS renamed_names_served
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_cents,
        |  'post' AS phase, TRUE AS renamed_names_served
        |FROM orders WHERE o_orderkey % 3 = 1
        |GROUP BY o_orderpriority""".stripMargin,
    // table-to-table pipeline: the silver TxLog table must hold exactly
    // the purchases projection after the stop/append/restart sequence
    "q_o_stream_txlog_pipeline" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS day,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    // stream-static LEFT enrich == the batch join (unmatched events
    // survive NULL-extended; every committed row exactly once)
    "q_o_stream_static_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
        |  CAST(round(e.value * 100) AS BIGINT) AS value_cents
        |FROM events e LEFT JOIN customer c
        |  ON e.user_id = c.c_custkey AND c.c_custkey % 2 = 0""".stripMargin,
    // streaming CDF mirror == the same closed-form membership as the
    // batch keyed-merge gate (q_o_txlog_merge_mirror), reached through
    // per-version change batches + a stop/widening-append/restart
    "q_o_stream_txlog_cdf" ->
      """SELECT o_orderkey AS id, o_custkey AS cust,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CASE WHEN o_orderkey % 4 = 3
        |       THEN CAST(o_orderkey % 7 AS BIGINT) END AS flag
        |FROM orders
        |WHERE (o_orderkey % 4 IN (0, 1) AND o_orderkey % 5 <> 2
        |       AND o_orderkey % 9 <> 4)
        |   OR (o_orderkey % 4 = 2 AND o_orderkey % 9 = 4)
        |   OR (o_orderkey % 4 = 3)""".stripMargin,
    // exactly-once TxLog sink: double-applied batches must not double rows
    "q_o_stream_txlog_sink" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        |FROM events""".stripMargin,
    // declarative sink format + crash-window restart-redelivery: the
    // redelivered batch must no-op against the txn watermark
    "q_o_stream_txlog_sink_fmt" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        |FROM events""".stripMargin,
    // mapGroupsWithState running totals: final state == batch groupBy
    "q_o_stream_running_stats" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,
    // append-mode replay: finalize-once emission must reconstruct the
    // SAME full window set the complete-mode gate pins
    "q_o_stream_append_replay" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
        |  event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // triangle replica: same degree-ordered orientation ((d, id)
    // tiebreak), same wedge b<c at the source, same undirected closure
    "q_o_triangle_count" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  WHERE a.l_partkey % 3 = 0 AND b.l_partkey % 3 = 0
        |),
        |deg AS (SELECT x, count(*) AS d FROM (
        |  SELECT u AS x FROM pairs UNION ALL SELECT v AS x FROM pairs) GROUP BY 1),
        |ori AS (
        |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS s,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS t
        |  FROM pairs JOIN deg du ON du.x = pairs.u JOIN deg dv ON dv.x = pairs.v
        |),
        |und AS (SELECT s AS b, t AS c FROM ori UNION ALL SELECT t AS b, s AS c FROM ori),
        |tri AS (
        |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
        |  FROM ori e1 JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t
        |  WHERE EXISTS (SELECT 1 FROM und WHERE und.b = e1.t AND und.c = e2.t)
        |),
        |pern AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
        |    UNION ALL SELECT c AS node FROM tri) GROUP BY 1)
        |SELECT tri_cnt, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM pern GROUP BY 1""".stripMargin,
    // the stream-stream join's final sink vs the batch interval join
    "q_o_stream_join_replay" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
        |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |  CAST(round(p.value * 100) AS BIGINT) AS value_cents,
        |  c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    // late-arrival replay: SAME batch oracle as q_o_stream_join_replay —
    // out-of-order delivery within the watermark must not change one row
    "q_o_stream_late_replay" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
        |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |  CAST(round(p.value * 100) AS BIGINT) AS value_cents,
        |  c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    // the streamed LEFT OUTER final sink vs the batch left join: outer
    // rows carry NULL purchase columns
    "q_o_stream_outer_replay" ->
      """SELECT c.user_id, c.event_id AS click_id,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts,
        |  p.event_id AS purchase_id,
        |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |  CAST(round(p.value * 100) AS BIGINT) AS value_cents
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin,
    // the JDBC round-trip must hand back EXACTLY the fact as computed from
    // parquet — same oracle text as q_gold_fact_daily; a lossy type map,
    // a duped re-publish, or a dropped row all hash-mismatch
    "q_gold_publish_jdbc" ->
      """WITH daily AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        |    COUNT(*) AS orders_count,
        |    CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
        |    CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS total_cents
        |  FROM orders WHERE o_custkey % 16 = 1 GROUP BY 1, 2)
        |SELECT o_custkey, COALESCE(customer_sk, 0) AS customer_sk, order_date,
        |  orders_count, open_count, total_cents
        |FROM daily LEFT JOIN (SELECT c_custkey, c_custkey + 1000 AS customer_sk
        |                      FROM customer WHERE c_custkey % 10 <> 0) c
        |  ON o_custkey = c_custkey""".stripMargin
  )
}
