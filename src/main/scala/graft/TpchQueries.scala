package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TPC-H-shaped join/subquery breadth beyond the reference's own medallion
  * queries (reference analogue: the gold-layer analytics snippets in
  * `Meta_Guideline.md` — groupBy-agg over joined fact/dim frames). The
  * classic TPC-H shapes are adapted to the driver's slimmer synthetic
  * schemas (no partsupp; lineitem lacks commitdate/receiptdate/shipmode),
  * keeping each query's *plan* shape intact: EXISTS → left-semi,
  * NOT EXISTS → left-anti, correlated scalar subqueries → Catalyst
  * decorrelation, group-wise max, disjunctive pushdown, outer-join
  * distributions.
  *
  * Oracle-stability rules are the same as SparkEntry's: exact integer
  * cents for money, single division of exact ints for ratios, NTZ
  * timestamps, explicit total ordering everywhere. Quantities are
  * integral doubles → compared/summed as BIGINT where exactness matters.
  *
  * Q17/Q21/Q22 are deliberately expressed through `spark.sql` over temp
  * views (the true correlated-subquery / EXISTS forms) so the engine's
  * subquery decorrelation is exercised as a first-class surface, not
  * hand-lowered away.
  */
object TpchQueries {

  private def T(s: SparkSession, dir: String): Tables = Tables(s, dir)

  private def sumCents(c: org.apache.spark.sql.Column) =
    sum(round(c * 100)).cast("long")

  private def ntz(lit0: String) = lit(lit0).cast("timestamp_ntz")

  // ---------------------------------------------------------------------------
  // Q2: minimum-cost supplier — the schema has no partsupp, so the
  // supplier-part offer relation is DERIVED (min observed line price per
  // (part, supplier) pair); the signature plan shape is intact: a correlated
  // scalar MIN subquery over the same 4-table join tree, which Catalyst
  // decorrelates into an aggregate-join (the CTE is referenced twice).
  // Money in exact cents; total (acctbal, nation, supplier, part) ordering.
  // ---------------------------------------------------------------------------
  private def q2(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "part", "supplier", "lineitem", "nation", "region")
    s.sql("""
      WITH offer AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS ps_cost_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
      )
      SELECT CAST(ROUND(s_acctbal*100) AS BIGINT) AS s_acctbal_cents,
             s_name, n_name, p_partkey, p_name, ps_cost_cents
      FROM part
      JOIN offer ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'SMALL' AND r_name = 'ASIA'
        AND ps_cost_cents = (
          SELECT MIN(o2.ps_cost_cents)
          FROM offer o2
          JOIN supplier s2 ON s2.s_suppkey = o2.ps_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE o2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
      ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
      LIMIT 100
    """)
  }

  // ---------------------------------------------------------------------------
  // Q4: priority count with EXISTS (left-semi join; returned-line existence
  // stands in for the commit/receipt lateness predicate the schema lacks).
  // ---------------------------------------------------------------------------
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    t.orders
      .filter(col("o_orderdate").cast("date") >= lit("1996-07-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1996-10-01").cast("date"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------------------
  // Q6: forecast revenue — pure filter+agg; every predicate reaches the
  // parquet scan (PushedFilters), no join, no shuffle beyond the final agg.
  // Discount compared in exact integer percent (round(d*100)), not FP.
  // ---------------------------------------------------------------------------
  private def q6(s: SparkSession, dir: String): DataFrame =
    T(s, dir).lineitem
      .filter(col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
        col("l_shipdate") < ntz("1998-01-01 00:00:00") &&
        round(col("l_discount") * 100).cast("long").between(5, 7) &&
        col("l_quantity") < 24)
      .agg(
        sum(round(col("l_extendedprice") * col("l_discount") * 100)).cast("long")
          .as("revenue_cents"),
        count(lit(1)).as("n_lines"))

  // ---------------------------------------------------------------------------
  // Q7: volume shipping between two nation groups — nation joined twice
  // under different roles (supplier side / customer side), both broadcast.
  // ---------------------------------------------------------------------------
  private def q7(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val suppN = Seq("NATION_1", "NATION_2", "NATION_3")
    val custN = Seq("NATION_4", "NATION_5", "NATION_6")
    val n1 = t.nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    t.supplier
      .join(t.lineitem, col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1.filter(col("supp_nation").isin(suppN: _*))),
        col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2.filter(col("cust_nation").isin(custN: _*))),
        col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate").cast("date")).as("l_year"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // ---------------------------------------------------------------------------
  // Q9: product-type profit by nation and year — 5-table join with a LIKE
  // filter on part name; profit = revenue − cost in exact integer cents,
  // with p_retailprice standing in for the missing ps_supplycost
  // (quantities are integral doubles → BIGINT-exact multiplication).
  // ---------------------------------------------------------------------------
  private def q9(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val amount =
      round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") -
        round(col("p_retailprice") * 100).cast("long") * col("l_quantity").cast("long")
    t.lineitem
      .join(t.part.filter(col("p_name").like("%widget%")),
        col("p_partkey") === col("l_partkey"))
      .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate").cast("date")).as("o_year"))
      .agg(sum(amount).cast("long").as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // ---------------------------------------------------------------------------
  // Q11: important stock — per-part value within one REGION's suppliers
  // (a single nation is empty at the smallest SF), kept only when the
  // part's value strictly exceeds the regional average (two scalar
  // subqueries — COUNT and SUM over the same CTE). Exact integers:
  // value·n > total, no floating fraction; classic Q11's fixed fraction
  // would need SF-dependent tuning (shares shrink ∝ 1/parts), the
  // above-average form is scale-invariant and provably non-empty.
  // ---------------------------------------------------------------------------
  private def q11(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "lineitem", "supplier", "nation", "region")
    s.sql("""
      WITH natval AS (
        SELECT l_partkey, CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
      )
      SELECT l_partkey AS ps_partkey, value_cents
      FROM natval
      WHERE value_cents * (SELECT COUNT(*) FROM natval)
            > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM natval)
      ORDER BY value_cents DESC, ps_partkey
    """)
  }

  // ---------------------------------------------------------------------------
  // Q12: late-shipped lines by return flag, split into high/low order
  // priority — conditional agg over an interval predicate on the join.
  // ---------------------------------------------------------------------------
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val t    = T(s, dir)
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
        col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
        col("l_shipdate") < ntz("1998-01-01 00:00:00"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------------------
  // Q13: customer order-count distribution — LEFT OUTER join with an ON-side
  // filter (kept out of WHERE so no-order customers survive), two-level agg.
  // ---------------------------------------------------------------------------
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // ---------------------------------------------------------------------------
  // Q14: promo revenue share in a month — the ratio is a SINGLE division of
  // two exact cent sums (100*promo_cents / total_cents), per the
  // oracle-stability rule.
  // ---------------------------------------------------------------------------
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val t     = T(s, dir)
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
    t.lineitem
      .filter(col("l_shipdate") >= ntz("1997-09-01 00:00:00") &&
        col("l_shipdate") < ntz("1997-10-01 00:00:00"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", cents).otherwise(lit(0L))).cast("long")
          .as("promo_cents"),
        sum(cents).cast("long").as("total_cents"))
      .withColumn("promo_share",
        (lit(100L) * col("promo_cents")) / col("total_cents"))
  }

  // ---------------------------------------------------------------------------
  // Q15: top supplier by quarterly revenue — group-wise max via a broadcast
  // single-row max crossJoin (no single-partition global window).
  // ---------------------------------------------------------------------------
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val revenue = t.lineitem
      .filter(col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
        col("l_shipdate") < ntz("1997-04-01 00:00:00"))
      .groupBy("l_suppkey")
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_cents"))
    val mx = revenue.agg(max(col("total_cents")).as("mx"))
    revenue
      .crossJoin(broadcast(mx))
      .filter(col("total_cents") === col("mx"))
      .join(broadcast(T(s, dir).supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy("s_suppkey")
  }

  // ---------------------------------------------------------------------------
  // Q16: supplier counts per part attribute triple — COUNT(DISTINCT) after a
  // NOT IN subquery, which Spark lowers to a null-aware anti join (a plan
  // shape none of the other queries exercise; s_suppkey is non-null so the
  // null-aware path degenerates to a plain anti join at runtime).
  // ---------------------------------------------------------------------------
  private def q16(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "lineitem", "part", "supplier")
    s.sql("""
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """)
  }

  // ---------------------------------------------------------------------------
  // Q17: small-quantity revenue — TRUE correlated scalar subqueries through
  // spark.sql; Catalyst decorrelates both into one aggregate join. The
  // avg-quantity comparison is exact integers: qty < sum/(5n) ⟺ 5·qty·n < sum.
  // ---------------------------------------------------------------------------
  private def q17(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "lineitem", "part")
    s.sql("""
      SELECT CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS total_cents,
             COUNT(*) AS n_lines
      FROM lineitem l JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#3' AND p_size < 15
        AND 5 * CAST(l_quantity AS BIGINT) *
            (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
          < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """)
  }

  // ---------------------------------------------------------------------------
  // Q18: large-volume orders — IN (groupBy-HAVING subquery) lowered to a
  // left-semi join against the qualifying order keys; then re-agg on the
  // enriched join. Threshold 150 keeps the qualifying set selective.
  // ---------------------------------------------------------------------------
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val t = T(s, dir)
    val big = t.lineitem
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("oq"))
      .filter(col("oq") > 150)
      .select(col("l_orderkey").as("big_orderkey"))
    t.orders
      .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
      .agg(sum("l_quantity").as("sum_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(20)
  }

  // ---------------------------------------------------------------------------
  // Q19: disjunctive pushdown — OR of three brand/size/quantity AND-blocks;
  // the shared p_partkey=l_partkey equi-key stays a hash join, the OR
  // residual evaluates post-join, and per-branch min-bounds are pushable.
  // ---------------------------------------------------------------------------
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val t  = T(s, dir)
    val b1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 11) && col("l_returnflag") === "N"
    val b2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
      col("l_quantity").between(10, 20) && col("l_linestatus") === "O"
    val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
      col("l_quantity").between(20, 30)
    t.lineitem
      .join(t.part, col("p_partkey") === col("l_partkey"))
      .filter(b1 || b2 || b3)
      .agg(
        sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------------------
  // Q20: potential part promotion — nested IN whose inner query carries a
  // correlated scalar subquery in HAVING (correlated on the group key, like
  // Q17's decorrelation but under an aggregate). "Shipped >30% of the
  // part's 1997 volume" stands in for availqty>½·shipped, exact integers:
  // 10·sum > 3·total.
  // ---------------------------------------------------------------------------
  private def q20(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "supplier", "nation", "lineitem", "part")
    s.sql("""
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
        AND s_suppkey IN (
          SELECT l1.l_suppkey
          FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
          WHERE p_name LIKE '%widget%'
            AND l1.l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
            AND l1.l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'
          GROUP BY l1.l_suppkey, l1.l_partkey
          HAVING 10 * SUM(CAST(l1.l_quantity AS BIGINT)) > 3 * (
            SELECT SUM(CAST(l2.l_quantity AS BIGINT))
            FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
              AND l2.l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
              AND l2.l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'))
      ORDER BY s_suppkey
    """)
  }

  // ---------------------------------------------------------------------------
  // Q21: suppliers who were the sole problem on a finished multi-supplier
  // order — EXISTS + NOT EXISTS on the same fact table (semi + anti join
  // against lineitem under different correlated predicates), via spark.sql.
  // Returned lines stand in for late receipt.
  // ---------------------------------------------------------------------------
  private def q21(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "supplier", "lineitem", "orders", "nation")
    s.sql("""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 10
    """)
  }

  // ---------------------------------------------------------------------------
  // Q22: inactive high-balance customers per nation — uncorrelated scalar
  // subqueries (count + sum of the eligible positive balances, exact-integer
  // avg comparison: cents·n > sum_cents) + correlated NOT EXISTS anti join,
  // via spark.sql. "No urgent order" stands in for "no order in 7 years"
  // (this corpus has no order-free customers).
  // ---------------------------------------------------------------------------
  private def q22(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, "customer", "orders")
    s.sql("""
      WITH eligible AS (
        SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)
      )
      SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
             CAST(SUM(ROUND(c_acctbal*100)) AS BIGINT) AS totacctbal_cents
      FROM eligible c
      WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) *
              (SELECT COUNT(*) FROM eligible WHERE c_acctbal > 0)
            > (SELECT CAST(SUM(ROUND(c_acctbal*100)) AS BIGINT)
               FROM eligible WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey
      ORDER BY cntrycode
    """)
  }

  /** Temp-view registration for the spark.sql-expressed queries. Views go
    * through [[Tables]] so the NTZ/nanos read conventions stay centralized.
    * Verify/Bench run queries sequentially on one session — overwrite
    * semantics make re-registration safe.
    */
  private def registerViews(s: SparkSession, dir: String, names: String*): Unit = {
    val t = T(s, dir)
    names.foreach {
      case n @ "lineitem" => t.lineitem.createOrReplaceTempView(n)
      case n @ "orders"   => t.orders.createOrReplaceTempView(n)
      case n @ "customer" => t.customer.createOrReplaceTempView(n)
      case n @ "supplier" => t.supplier.createOrReplaceTempView(n)
      case n @ "nation"   => t.nation.createOrReplaceTempView(n)
      case n @ "part"     => t.part.createOrReplaceTempView(n)
      case n @ "region"   => t.region.createOrReplaceTempView(n)
      case n             => sys.error(s"unknown view: $n")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2_min_cost_supp"   -> (q2 _),
    "q_tpch_q9_profit"          -> (q9 _),
    "q_tpch_q11_important_stock" -> (q11 _),
    "q_tpch_q16_supplier_cnt"   -> (q16 _),
    "q_tpch_q20_promotion"      -> (q20 _),
    "q_tpch_q4_priority_exists" -> (q4 _),
    "q_tpch_q6_forecast"        -> (q6 _),
    "q_tpch_q7_volume_shipping" -> (q7 _),
    "q_tpch_q12_late_priority"  -> (q12 _),
    "q_tpch_q13_custdist"       -> (q13 _),
    "q_tpch_q14_promo_share"    -> (q14 _),
    "q_tpch_q15_top_supplier"   -> (q15 _),
    "q_tpch_q17_small_qty"      -> (q17 _),
    "q_tpch_q18_large_orders"   -> (q18 _),
    "q_tpch_q19_disjunctive"    -> (q19 _),
    "q_tpch_q21_waiting"        -> (q21 _),
    "q_tpch_q22_inactive"       -> (q22 _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_tpch_q2_min_cost_supp" ->
      """WITH offer AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS ps_cost_cents
        |  FROM lineitem GROUP BY l_partkey, l_suppkey
        |)
        |SELECT CAST(ROUND(s_acctbal*100) AS BIGINT) AS s_acctbal_cents,
        |       s_name, n_name, p_partkey, p_name, ps_cost_cents
        |FROM part
        |JOIN offer ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'SMALL' AND r_name = 'ASIA'
        |  AND ps_cost_cents = (
        |    SELECT MIN(o2.ps_cost_cents)
        |    FROM offer o2
        |    JOIN supplier s2 ON s2.s_suppkey = o2.ps_suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE o2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q9_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
        |    - CAST(ROUND(p_retailprice*100) AS BIGINT) * CAST(l_quantity AS BIGINT))
        |    AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q_tpch_q11_important_stock" ->
      """WITH natval AS (
        |  SELECT l_partkey, CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY l_partkey
        |)
        |SELECT l_partkey AS ps_partkey, value_cents
        |FROM natval
        |WHERE value_cents * (SELECT COUNT(*) FROM natval)
        |      > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM natval)
        |ORDER BY value_cents DESC, ps_partkey""".stripMargin,
    "q_tpch_q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20_promotion" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
        |  AND s_suppkey IN (
        |    SELECT l1.l_suppkey
        |    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |    WHERE p_name LIKE '%widget%'
        |      AND l1.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND l1.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |    GROUP BY l1.l_suppkey, l1.l_partkey
        |    HAVING 10 * SUM(CAST(l1.l_quantity AS BIGINT)) > 3 * (
        |      SELECT SUM(CAST(l2.l_quantity AS BIGINT))
        |      FROM lineitem l2
        |      WHERE l2.l_partkey = l1.l_partkey
        |        AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q6_forecast" ->
      """SELECT CAST(SUM(ROUND(l_extendedprice*l_discount*100)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(vol_cents) AS BIGINT) AS revenue_cents
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
        |    CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS vol_cents
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3')
        |    AND n2.n_name IN ('NATION_4','NATION_5','NATION_6')
        |) GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q14_promo_share" ->
      """SELECT promo_cents, total_cents,
        |  (100 * promo_cents) / total_cents AS promo_share
        |FROM (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN ROUND(l_extendedprice*(1-l_discount)*100) ELSE 0 END) AS BIGINT) AS promo_cents,
        |    CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS total_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
        |)""".stripMargin,
    "q_tpch_q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, total_cents
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q17_small_qty" ->
      """SELECT CAST(SUM(ROUND(l_extendedprice*100)) AS BIGINT) AS total_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size < 15
        |  AND 5 * CAST(l_quantity AS BIGINT) *
        |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    "q_tpch_q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents,
        |  SUM(l_quantity) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        |GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE),
        |  CAST(ROUND(o_totalprice*100) AS BIGINT)
        |ORDER BY total_cents DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_tpch_q19_disjunctive" ->
      """SELECT CAST(SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 11 AND l_returnflag = 'N')
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity BETWEEN 10 AND 20 AND l_linestatus = 'O')
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_q21_waiting" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q_tpch_q22_inactive" ->
      """WITH eligible AS (
        |  SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |)
        |SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(ROUND(c_acctbal*100)) AS BIGINT) AS totacctbal_cents
        |FROM eligible c
        |WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) *
        |        (SELECT COUNT(*) FROM eligible WHERE c_acctbal > 0)
        |      > (SELECT CAST(SUM(ROUND(c_acctbal*100)) AS BIGINT)
        |         FROM eligible WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin
  )
}
