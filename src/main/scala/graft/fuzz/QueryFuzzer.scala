package graft.fuzz

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential query fuzzer: a seeded generator over the testdata schema
  * that emits each random query TWICE in lockstep — once as a Spark
  * DataFrame plan, once as the DuckDB SQL twin — so the two engines can be
  * diffed mechanically at scale (the machine-generated extension of the
  * hand-picked oracle gate; the reference's acceptance-test spirit,
  * multiplied).
  *
  * The grammar covers the SURVEY §2 shapes (filter / project (+DISTINCT) /
  * inner+left+FULL OUTER join on FK relationships / 3-4 table join chains /
  * semi+anti joins vs IN-subqueries / group-aggregate with HAVING /
  * ROLLUP+CUBE with GROUPING markers / scalar aggregate / window functions
  * incl. explicit ROWS frames, lead/lag, first_value / ordered top-K /
  * UNION ALL, UNION, INTERSECT, EXCEPT) and applies the oracle-stability
  * house rules MECHANICALLY:
  *
  *  - money only as exact integer cents (`round(x*100)` cast BIGINT —
  *    never raw doubles in any output or aggregate)
  *  - every integral expression normalized to BIGINT on both sides
  *    (DuckDB SUM/COUNT would otherwise surface HUGEINT)
  *  - timestamps only through `CAST(... AS DATE)`
  *  - every window ORDER BY is a TOTAL order (expression + the table's
  *    unique tiebreak columns) with EXPLICIT null placement (Spark
  *    defaults NULLS FIRST on ASC, DuckDB NULLS LAST — rendered
  *    explicitly so both agree)
  *  - no division, no doubles, no locale-sensitive case ops on non-ASCII
  *    columns
  *
  * Comparison is row-set equality after canonical string formatting and
  * sorting (no ORDER BY in the queries themselves).
  */
object QueryFuzzer {

  sealed trait Typ
  case object TInt  extends Typ
  case object TStr  extends Typ
  case object TDate extends Typ
  case object TBool extends Typ

  /** One expression, rendered for both engines in lockstep. */
  final case class E(spark: Column, sql: String, typ: Typ)

  final case class ColMeta(name: String, typ: Typ,
      money: Boolean = false, ascii: Boolean = true, values: Seq[String] = Nil)

  final case class TableMeta(name: String, cols: Seq[ColMeta], tie: Seq[String]) {
    def col(n: String): ColMeta = cols.find(_.name == n).get
  }

  val tables: Seq[TableMeta] = Seq(
    TableMeta("lineitem", Seq(
      ColMeta("l_orderkey", TInt), ColMeta("l_partkey", TInt),
      ColMeta("l_suppkey", TInt), ColMeta("l_linenumber", TInt),
      ColMeta("l_quantity", TInt, money = true), // integral-valued double
      ColMeta("l_extendedprice", TInt, money = true),
      ColMeta("l_returnflag", TStr, values = Seq("R", "A", "N")),
      ColMeta("l_linestatus", TStr, values = Seq("F", "O")),
      ColMeta("l_shipdate", TDate)), Seq("l_orderkey", "l_linenumber")),
    TableMeta("orders", Seq(
      ColMeta("o_orderkey", TInt), ColMeta("o_custkey", TInt),
      ColMeta("o_orderstatus", TStr, values = Seq("F", "P", "O")),
      ColMeta("o_totalprice", TInt, money = true),
      ColMeta("o_orderdate", TDate),
      ColMeta("o_orderpriority", TStr, values = Seq(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))),
      Seq("o_orderkey")),
    TableMeta("customer", Seq(
      ColMeta("c_custkey", TInt), ColMeta("c_nationkey", TInt),
      ColMeta("c_name", TStr),
      ColMeta("c_acctbal", TInt, money = true),
      ColMeta("c_mktsegment", TStr, values = Seq(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"))),
      Seq("c_custkey")),
    TableMeta("part", Seq(
      ColMeta("p_partkey", TInt), ColMeta("p_size", TInt),
      ColMeta("p_name", TStr), ColMeta("p_brand", TStr,
        values = Seq("Brand#1", "Brand#7", "Brand#13", "Brand#22")),
      ColMeta("p_type", TStr),
      ColMeta("p_retailprice", TInt, money = true)), Seq("p_partkey")),
    TableMeta("supplier", Seq(
      ColMeta("s_suppkey", TInt), ColMeta("s_nationkey", TInt),
      ColMeta("s_name", TStr),
      ColMeta("s_acctbal", TInt, money = true)), Seq("s_suppkey")),
    TableMeta("nation", Seq(
      ColMeta("n_nationkey", TInt), ColMeta("n_regionkey", TInt),
      ColMeta("n_name", TStr)), Seq("n_nationkey")),
    TableMeta("region", Seq(
      ColMeta("r_regionkey", TInt), ColMeta("r_name", TStr)),
      Seq("r_regionkey")),
    TableMeta("documents", Seq(
      ColMeta("doc_id", TInt), ColMeta("n_chars", TInt),
      ColMeta("lang", TStr, values = Seq("en", "de", "fr", "es", "zh")),
      ColMeta("source", TStr, values = Seq("src0", "src3", "src7", "src12")),
      ColMeta("text", TStr, ascii = false)), Seq("doc_id"))
  )

  /** FK relationships the join generator draws from: (left table, left
    * key, right table, right key).
    */
  val joins: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey")
  )

  final case class FuzzQuery(
      seed: Long,
      sql: String,
      build: (SparkSession, String) => DataFrame,
      desc: String)

  // ---------------------------------------------------------------------
  // Generation
  // ---------------------------------------------------------------------

  /** java.util.Random's first draws are strongly correlated across
    * sequential seeds (with a power-of-2 bound the first nextInt is nearly
    * CONSTANT over a seed range — observed: 300 sequential seeds produced
    * 2 of 16 query shapes). Scramble the seed through a splitmix64
    * finalizer before it touches Random so the shape draw is uniform.
    */
  private def scramble(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def generate(seed: Long): FuzzQuery =
    new Gen(new Random(scramble(seed)), seed).query()

  private final class Gen(rnd: Random, seed: Long) {

    private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

    /** An integral column reference, normalized to BIGINT on both sides;
      * money doubles enter ONLY through the exact-cents idiom.
      */
    private def intCol(t: TableMeta): E = {
      val c = pick(t.cols.filter(_.typ == TInt))
      if (c.money)
        E(round(col(c.name) * 100).cast("long"),
          s"CAST(round(${c.name} * 100) AS BIGINT)", TInt)
      else
        E(col(c.name).cast("long"), s"CAST(${c.name} AS BIGINT)", TInt)
    }

    private def strCol(t: TableMeta): ColMeta =
      pick(t.cols.filter(_.typ == TStr))

    private def dateCols(t: TableMeta): Seq[ColMeta] =
      t.cols.filter(_.typ == TDate)

    /** Integer expression of bounded depth; addition/subtraction, small
      * multipliers, modulo on a column, CASE — no division, no overflow
      * reach (cents ≤ 1e7, multipliers ≤ 9, depth ≤ 2).
      */
    private def intExpr(t: TableMeta, depth: Int = 0): E = {
      val leaf = rnd.nextInt(14)
      if (depth >= 2 || leaf < 4) intCol(t)
      else leaf match {
        case 13 => // CASE with NO ELSE — the implicit NULL-typed branch
          // (both engines: missing ELSE is NULL of the THEN type)
          val b = boolExpr(t, depth + 1); val x = intCol(t)
          E(when(b.spark, x.spark),
            s"(CASE WHEN ${b.sql} THEN ${x.sql} END)", TInt)
        case 4 | 5 =>
          val a = intExpr(t, depth + 1); val b = intExpr(t, depth + 1)
          if (rnd.nextBoolean())
            E(a.spark + b.spark, s"(${a.sql} + ${b.sql})", TInt)
          else E(a.spark - b.spark, s"(${a.sql} - ${b.sql})", TInt)
        case 6 =>
          val a = intExpr(t, depth + 1); val k = 2 + rnd.nextInt(8)
          E(a.spark * k, s"(${a.sql} * $k)", TInt)
        case 7 | 8 =>
          val a = intCol(t); val m = 2 + rnd.nextInt(11)
          E(a.spark % m, s"(${a.sql} % $m)", TInt)
        case 9 =>
          val b = boolExpr(t, depth + 1)
          val x = intCol(t); val y = intCol(t)
          E(when(b.spark, x.spark).otherwise(y.spark),
            s"(CASE WHEN ${b.sql} THEN ${x.sql} ELSE ${y.sql} END)", TInt)
        case 10 => // greatest/least over NON-NULL args only — the engines'
          // NULL-skipping rules differ, so nullable args stay out
          val a = intExpr(t, depth + 1); val b = intExpr(t, depth + 1)
          if (rnd.nextBoolean())
            E(greatest(a.spark, b.spark), s"greatest(${a.sql}, ${b.sql})", TInt)
          else E(least(a.spark, b.spark), s"least(${a.sql}, ${b.sql})", TInt)
        case 11 => // COALESCE over a NULL-folding arm — standard in both
          val a = nullableInt(t); val b = intCol(t)
          E(coalesce(a.spark, b.spark), s"COALESCE(${a.sql}, ${b.sql})", TInt)
        case _ => // NULLIF — a second NULL producer besides nullableInt
          val a = intCol(t); val m = 2 + rnd.nextInt(7)
          E(nullif(a.spark % m, lit(0L)), s"NULLIF((${a.sql} % $m), 0)", TInt)
      }
    }

    private def strExpr(t: TableMeta): E = {
      val c = strCol(t)
      rnd.nextInt(4) match {
        case 0 if c.ascii =>
          E(upper(col(c.name)), s"upper(${c.name})", TStr)
        case 1 if c.ascii =>
          E(lower(col(c.name)), s"lower(${c.name})", TStr)
        case 2 =>
          val k = 1 + rnd.nextInt(6)
          E(substring(col(c.name), 1, k), s"substr(${c.name}, 1, $k)", TStr)
        case _ => E(col(c.name), c.name, TStr)
      }
    }

    private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

    private def dateLit(): (Column, String) = {
      val y = 1995 + rnd.nextInt(7); val m = 1 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(28)
      val s = f"$y%04d-$m%02d-$d%02d"
      (lit(java.sql.Date.valueOf(s)), s"DATE '$s'")
    }

    private val cmps = Seq(
      (">=", (a: Column, b: Column) => a >= b),
      ("<=", (a: Column, b: Column) => a <= b),
      (">",  (a: Column, b: Column) => a > b),
      ("<",  (a: Column, b: Column) => a < b),
      ("=",  (a: Column, b: Column) => a === b),
      ("<>", (a: Column, b: Column) => a =!= b))

    /** NULL-folding integral expression: one modular bucket becomes NULL,
      * the rest a SMALL modular range so two independent draws collide
      * often — the value space where null-safe equality actually matters.
      */
    private def nullableInt(t: TableMeta): E = {
      val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
      val m = 2 + rnd.nextInt(7)
      val k = 2 + rnd.nextInt(5)
      val base = s"CAST(${c.name} AS BIGINT)"
      E(when(col(c.name).cast("long") % m === 0, lit(null).cast("long"))
        .otherwise(col(c.name).cast("long") % k),
        s"(CASE WHEN $base % $m = 0 THEN NULL ELSE $base % $k END)", TInt)
    }

    private def boolExpr(t: TableMeta, depth: Int = 0): E = {
      def leaf(): E = rnd.nextInt(14) match {
        case 11 => // array membership — Spark array_contains vs DuckDB
          // list_contains over the split tokens
          val c = asciiStrCol(t)
          val tok =
            if (c.values.nonEmpty && rnd.nextBoolean())
              pick(c.values).split(' ').head
            else pick(Seq("a", "the", "Brand", "src3", "1-URGENT", "x"))
          E(array_contains(split(col(c.name),
              java.util.regex.Pattern.quote(" ")), tok),
            s"list_contains(string_split(${c.name}, ' '), ${sqlStr(tok)})",
            TBool)
        case 12 => // ILIKE with a case-scrambled pattern (both engines:
          // case-insensitive LIKE; ASCII domains only — non-ASCII case
          // folding is locale-dependent and stays out by house rule)
          val cands = t.cols.filter(c =>
            c.typ == TStr && c.ascii && c.values.nonEmpty)
          val (cname, v) =
            if (cands.isEmpty) (asciiStrCol(t).name, "ab")
            else { val c = pick(cands); (c.name, pick(c.values)) }
          val scrambled = v.take(1 + rnd.nextInt(math.max(1, v.length)))
            .map(ch => if (rnd.nextBoolean()) ch.toUpper else ch.toLower)
          val p = scrambled + "%"
          E(col(cname).ilike(p), s"(${cname} ILIKE ${sqlStr(p)})", TBool)
        case 13 => // ESCAPED wildcard: '\_' is a LITERAL underscore under
          // Spark's default escape; DuckDB needs the explicit ESCAPE
          // clause — an engine treating it as the one-char wildcard
          // matches different rows (no domain value contains '_', so the
          // literal reading matches nothing; the wildcard reading would)
          val cands = t.cols.filter(c =>
            c.typ == TStr && c.ascii && c.values.nonEmpty)
          val (cname, v) =
            if (cands.isEmpty) (asciiStrCol(t).name, "abc")
            else { val c = pick(cands); (c.name, pick(c.values)) }
          val p = v.take(1 + rnd.nextInt(3)) + "\\_%"
          E(col(cname).like(p),
            s"(${cname} LIKE ${sqlStr(p)} ESCAPE '\\')", TBool)
        case 9 => // BETWEEN (inclusive both ends in both engines)
          val a = intExpr(t, depth + 1)
          val lo = rnd.nextInt(2000).toLong
          val hi = lo + rnd.nextInt(500000).toLong
          E(a.spark.between(lit(lo), lit(hi)),
            s"(${a.sql} BETWEEN $lo AND $hi)", TBool)
        case 10 => // infix / underscore LIKE over known ASCII domains
          val cands = t.cols.filter(c =>
            c.typ == TStr && c.ascii && c.values.nonEmpty)
          if (cands.isEmpty) {
            val c = strCol(t)
            val p = pick(Seq("a", "b", "s", "B", "c", "e"))
            E(col(c.name).like(p + "%"),
              s"(${c.name} LIKE ${sqlStr(p + "%")})", TBool)
          } else {
            val c = pick(cands)
            val v = pick(c.values)
            val p = rnd.nextInt(3) match {
              case 0 => // infix slice
                val from = rnd.nextInt(math.max(1, v.length - 1))
                "%" + v.substring(from,
                  math.min(v.length, from + 1 + rnd.nextInt(3))) + "%"
              case 1 => // one char blinded to _
                val i = rnd.nextInt(v.length)
                v.substring(0, i) + "_" + v.substring(i + 1) + "%"
              case _ => // suffix
                "%" + v.substring(rnd.nextInt(v.length))
            }
            E(col(c.name).like(p), s"(${c.name} LIKE ${sqlStr(p)})", TBool)
          }
        case 8 => // NULL-safe equality: Spark <=> vs IS [NOT] DISTINCT FROM
          // (NULL <=> NULL is TRUE, NULL <=> x is FALSE — never UNKNOWN,
          // unlike =; the one comparison that is total over nulls)
          val a = nullableInt(t)
          val b = if (rnd.nextInt(4) == 0)
            E(lit(null).cast("long"), "NULL", TInt)
          else nullableInt(t)
          if (rnd.nextBoolean())
            E(a.spark <=> b.spark,
              s"(${a.sql} IS NOT DISTINCT FROM ${b.sql})", TBool)
          else
            E(!(a.spark <=> b.spark),
              s"(${a.sql} IS DISTINCT FROM ${b.sql})", TBool)
        case 6 => // three-valued logic: IS [NOT] NULL on any column
          // (bites on join-null-extended sides and nullable aggs)
          val c = pick(t.cols)
          if (rnd.nextBoolean())
            E(col(c.name).isNull, s"(${c.name} IS NULL)", TBool)
          else E(col(c.name).isNotNull, s"(${c.name} IS NOT NULL)", TBool)
        case 7 if dateCols(t).nonEmpty => // date arithmetic comparison
          val c = pick(dateCols(t)); val (dl, ds) = dateLit()
          val k = 1 + rnd.nextInt(90)
          val (op, f) = pick(cmps.take(4))
          E(f(date_add(col(c.name).cast("date"), k), dl),
            s"((CAST(${c.name} AS DATE) + $k) $op $ds)", TBool)
        case 0 | 1 => // int comparison against a plausible literal
          val a = intExpr(t, depth + 1)
          val v = rnd.nextInt(4) match {
            case 0 => rnd.nextInt(200).toLong        // small keys/sizes
            case 1 => rnd.nextInt(2000).toLong       // key mid-range
            case 2 => 100000L + rnd.nextInt(5000000) // cents scale
            case _ => rnd.nextInt(10).toLong         // modular buckets
          }
          val (op, f) = pick(cmps)
          E(f(a.spark, lit(v)), s"(${a.sql} $op $v)", TBool)
        case 2 => // string equality / IN over the known domain
          val c = strCol(t)
          if (c.values.nonEmpty && rnd.nextBoolean()) {
            val vs = rnd.shuffle(c.values).take(1 + rnd.nextInt(c.values.length))
            if (vs.length == 1)
              E(col(c.name) === vs.head, s"(${c.name} = ${sqlStr(vs.head)})", TBool)
            else
              E(col(c.name).isin(vs: _*),
                s"(${c.name} IN (${vs.map(sqlStr).mkString(", ")}))", TBool)
          } else {
            val p = if (c.values.nonEmpty) pick(c.values).take(1 + rnd.nextInt(3))
                    else pick(Seq("a", "b", "s", "B", "c", "e"))
            E(col(c.name).like(p + "%"),
              s"(${c.name} LIKE ${sqlStr(p + "%")})", TBool)
          }
        case 3 if dateCols(t).nonEmpty => // date range
          val c = pick(dateCols(t)); val (dl, ds) = dateLit()
          val (op, f) = pick(cmps.take(4))
          E(f(col(c.name).cast("date"), dl),
            s"(CAST(${c.name} AS DATE) $op $ds)", TBool)
        case 4 => // int vs int comparison
          val a = intExpr(t, depth + 1); val b = intExpr(t, depth + 1)
          val (op, f) = pick(cmps)
          E(f(a.spark, b.spark), s"(${a.sql} $op ${b.sql})", TBool)
        case _ => // guaranteed-selective modular predicate on a key column
          val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
          val m = 2 + rnd.nextInt(9); val r = rnd.nextInt(m)
          E(col(c.name).cast("long") % m === r,
            s"(CAST(${c.name} AS BIGINT) % $m = $r)", TBool)
      }
      if (depth >= 2 || rnd.nextInt(3) > 0) leaf()
      else rnd.nextInt(5) match {
        case 0 =>
          val a = boolExpr(t, depth + 1)
          E(!a.spark, s"(NOT ${a.sql})", TBool)
        case 1 | 2 =>
          val a = boolExpr(t, depth + 1); val b = boolExpr(t, depth + 1)
          E(a.spark && b.spark, s"(${a.sql} AND ${b.sql})", TBool)
        case _ =>
          val a = boolExpr(t, depth + 1); val b = boolExpr(t, depth + 1)
          E(a.spark || b.spark, s"(${a.sql} OR ${b.sql})", TBool)
      }
    }

    /** An ASCII string column (every table has at least one). */
    private def asciiStrCol(t: TableMeta): ColMeta = {
      val cands = t.cols.filter(c => c.typ == TStr && c.ascii)
      if (cands.isEmpty) strCol(t) else pick(cands)
    }

    /** Any scalar expression usable in a projection or as a group key. */
    private def scalarExpr(t: TableMeta): E = rnd.nextInt(14) match {
      case 12 => // ARRAY length via split — Spark split/size vs DuckDB
        // string_split/len (single-char literal separator, NOT a regex
        // metachar: Spark's split takes a REGEX, DuckDB's is literal —
        // space and '#' mean the same thing to both). Both keep trailing
        // empty fields (Spark limit -1, DuckDB default).
        val c = asciiStrCol(t)
        val sep = pick(Seq(" ", "#", "-"))
        E(size(split(col(c.name), java.util.regex.Pattern.quote(sep)))
            .cast("long"),
          s"CAST(len(string_split(${c.name}, ${sqlStr(sep)})) AS BIGINT)",
          TInt)
      case 13 => // array element by index — HOUSE RULE (caught by this
        // grammar's first sweep): Spark 4 ANSI `element_at` THROWS on an
        // out-of-bounds index while DuckDB's list index returns NULL;
        // `try_element_at` is the NULL-on-OOB twin (both 1-based)
        val c = asciiStrCol(t)
        val i = 1 + rnd.nextInt(3)
        E(try_element_at(split(col(c.name),
            java.util.regex.Pattern.quote(" ")), lit(i)),
          s"(string_split(${c.name}, ' ')[$i])", TStr)
      case 0 | 1 | 2 | 3 => intExpr(t)
      case 4 | 5         => strExpr(t)
      case 6 if dateCols(t).nonEmpty =>
        val c = pick(dateCols(t))
        E(col(c.name).cast("date"), s"CAST(${c.name} AS DATE)", TDate)
      case 7 =>
        val c = strCol(t)
        E(length(col(c.name)).cast("long"),
          s"CAST(length(${c.name}) AS BIGINT)", TInt)
      case 8 if dateCols(t).nonEmpty => // calendar extraction
        val c = pick(dateCols(t))
        val (f, fs): (Column => Column, String) =
          pick(Seq(((x: Column) => year(x), "year"),
            ((x: Column) => month(x), "month"),
            ((x: Column) => dayofmonth(x), "day")))
        E(f(col(c.name).cast("date")).cast("long"),
          s"CAST($fs(CAST(${c.name} AS DATE)) AS BIGINT)", TInt)
      case 9 => // floor division (both engines: float /, floor, cast —
        // exact for key magnitudes well under 2^53)
        val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
        val k = 2 + rnd.nextInt(11)
        E(floor(col(c.name).cast("long") / k).cast("long"),
          s"CAST(floor(CAST(${c.name} AS BIGINT) / $k) AS BIGINT)", TInt)
      case 10 =>
        val a = intExpr(t)
        E(abs(a.spark), s"abs(${a.sql})", TInt)
      case 11 => // string concatenation — NULL-propagating in both engines
        val a = strExpr(t); val b = strExpr(t)
        E(concat(a.spark, lit("_"), b.spark),
          s"(${a.sql} || '_' || ${b.sql})", TStr)
      case _ => intExpr(t)
    }

    /** Low-cardinality group key. */
    private def groupKey(t: TableMeta): E = rnd.nextInt(7) match {
      case 5 => // searched-CASE bucket over an integral column
        val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
        val t1 = 10 + rnd.nextInt(500)
        val t2 = t1 + 1 + rnd.nextInt(2000)
        val base = s"CAST(${c.name} AS BIGINT)"
        E(when(col(c.name).cast("long") < t1, lit("lo"))
            .when(col(c.name).cast("long") < t2, lit("mid"))
            .otherwise(lit("hi")),
          s"(CASE WHEN $base < $t1 THEN 'lo' WHEN $base < $t2 THEN 'mid' " +
            "ELSE 'hi' END)", TStr)
      case 6 if dateCols(t).nonEmpty => // calendar-month bucket
        val c = pick(dateCols(t))
        E(trunc(col(c.name).cast("date"), "month"),
          s"CAST(date_trunc('month', CAST(${c.name} AS DATE)) AS DATE)", TDate)
      case 0 | 1 =>
        val c = strCol(t)
        E(col(c.name), c.name, TStr)
      case 2 if dateCols(t).nonEmpty =>
        val c = pick(dateCols(t))
        E(col(c.name).cast("date"), s"CAST(${c.name} AS DATE)", TDate)
      case 3 => // NULL-producing key: one modular bucket folded to NULL, so
        // aggregation/rollup paths see a REAL null group next to the
        // subtotal nulls the GROUPING markers disambiguate
        val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
        val m = 3 + rnd.nextInt(8)
        val e = s"(CAST(${c.name} AS BIGINT) % $m)"
        E(when(col(c.name).cast("long") % m === 0, lit(null).cast("long"))
          .otherwise(col(c.name).cast("long") % m),
          s"(CASE WHEN $e = 0 THEN NULL ELSE $e END)", TInt)
      case _ =>
        val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
        val m = 3 + rnd.nextInt(10)
        E(col(c.name).cast("long") % m, s"(CAST(${c.name} AS BIGINT) % $m)", TInt)
    }

    private def aggExpr(t: TableMeta): E = rnd.nextInt(9) match {
      case 0 =>
        E(count(lit(1)), "CAST(count(*) AS BIGINT)", TInt)
      case 7 => // non-null count of a plain column
        val c = pick(t.cols)
        E(count(col(c.name)), s"CAST(count(${c.name}) AS BIGINT)", TInt)
      case 8 => // DISTINCT sum over a non-money integral column
        val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
        E(sum_distinct(col(c.name).cast("long")),
          s"CAST(sum(DISTINCT CAST(${c.name} AS BIGINT)) AS BIGINT)", TInt)
      case 1 =>
        val a = intExpr(t)
        E(sum(a.spark), s"CAST(sum(${a.sql}) AS BIGINT)", TInt)
      case 2 =>
        val a = intExpr(t)
        E(min(a.spark), s"CAST(min(${a.sql}) AS BIGINT)", TInt)
      case 3 =>
        val a = intExpr(t)
        E(max(a.spark), s"CAST(max(${a.sql}) AS BIGINT)", TInt)
      case 4 =>
        val c = strCol(t)
        if (rnd.nextBoolean()) E(min(col(c.name)), s"min(${c.name})", TStr)
        else E(max(col(c.name)), s"max(${c.name})", TStr)
      case 5 =>
        val c = pick(t.cols.filter(c => c.typ != TDate))
        E(countDistinct(col(c.name)),
          s"CAST(count(DISTINCT ${c.name}) AS BIGINT)", TInt)
      case _ =>
        // conditional aggregation (the A2 shape): sum of CASE
        val b = boolExpr(t); val a = intExpr(t)
        E(sum(when(b.spark, a.spark).otherwise(lit(0L))),
          s"CAST(sum(CASE WHEN ${b.sql} THEN ${a.sql} ELSE 0 END) AS BIGINT)",
          TInt)
    }

    // -------------------------------------------------------------------
    // Sources: single table or an FK join (inner / left)
    // -------------------------------------------------------------------

    /** A source: how to build the frame, the FROM clause, the merged
      * column universe for expression generation, and tiebreak columns.
      */
    /** `preWhere`: a condition already applied in `build` (semi/anti
      * subquery membership) that the SQL twin must AND into its WHERE.
      */
    private final case class Src(
        build: (SparkSession, String) => DataFrame,
        from: String,
        meta: TableMeta,
        desc: String,
        preWhere: Option[String] = None) {
      def whereSql(extra: Option[String]): String = {
        val conds = preWhere.toSeq ++ extra.toSeq
        if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      }
    }

    private def tableDf(name: String)(s: SparkSession, dir: String): DataFrame =
      s.read.parquet(s"$dir/$name.parquet")

    /** Three-table FK chains for multi-way joins (inner only; the left
      * table's tiebreak stays unique since every hop lands on a PK side).
      */
    private val chains: Seq[Seq[(String, String, String, String)]] = Seq(
      Seq(("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey")),
      Seq(("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey")),
      Seq(("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey")),
      Seq(("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey")),
      // four-table FK chain — every hop still lands on a PK side
      Seq(("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey")))

    private def chainSource(): Src = {
      val chain = pick(chains)
      val lt = tables.find(_.name == chain.head._1).get
      val rts = chain.map(h => tables.find(_.name == h._3).get)
      val merged = TableMeta(chain.map(_._1).head + "_chain",
        lt.cols ++ rts.flatMap(_.cols), lt.tie)
      val fromSql = chain.foldLeft(lt.name) { case (acc, (_, lk, rn, rk)) =>
        s"$acc INNER JOIN $rn ON $lk = $rk"
      }
      Src(
        (s, dir) => chain.foldLeft(tableDf(lt.name)(s, dir)) {
          case (acc, (_, lk, rn, rk)) =>
            acc.join(tableDf(rn)(s, dir), col(lk) === col(rk), "inner")
        },
        fromSql, merged, s"chain-${chain.map(_._3).mkString("-")}")
    }

    /** Semi/anti join source: the J2/J4 filtering-join shapes — Spark
      * left_semi/left_anti vs the SQL `IN (subquery)` twin. Key columns
      * are non-null, so NOT IN has no three-valued surprise.
      */
    private def semiSource(): Src = {
      val (ln, lk, rn, rk) = pick(joins)
      val lt = tables.find(_.name == ln).get
      val rt = tables.find(_.name == rn).get
      val anti = rnd.nextBoolean()
      val rightFilter = boolExpr(rt)
      val build = (s: SparkSession, dir: String) =>
        tableDf(ln)(s, dir).join(
          tableDf(rn)(s, dir).filter(rightFilter.spark).select(col(rk)),
          col(lk) === col(rk), if (anti) "left_anti" else "left_semi")
      if (rnd.nextBoolean()) {
        // explicit SEMI/ANTI JOIN syntax on the DuckDB side (its native
        // filtering-join keywords) against the same Spark left_semi/anti
        // plan — a second rendering of the same semantics, so a
        // divergence in either engine's join-type handling surfaces
        val kw = if (anti) "ANTI" else "SEMI"
        Src(build,
          s"$ln $kw JOIN (SELECT * FROM $rn WHERE ${rightFilter.sql}) " +
            s"AS $rn ON $lk = $rk",
          lt, s"${if (anti) "anti-join" else "semi-join"}/$ln-$rn")
      } else {
        val inOp = if (anti) "NOT IN" else "IN"
        Src(build, ln, lt, s"${if (anti) "anti" else "semi"}/$ln-$rn",
          preWhere = Some(
            s"$lk $inOp (SELECT $rk FROM $rn WHERE ${rightFilter.sql})"))
      }
    }

    /** JOIN ... USING source: both sides pre-project their FK key to ONE
      * shared name, the join is rendered `USING (k_u)` (DuckDB) against
      * Spark's `join(right, Seq("k_u"))` — the column-DEDUP semantics
      * (one output key column, never two) that ON-joins don't have, and a
      * classic cross-engine divergence spot (which side's value survives
      * in outer joins: the LEFT's, in both engines' LEFT USING).
      */
    private def usingJoinSource(): Src = {
      val (ln, lk, rn, rk) = pick(joins)
      val lt = tables.find(_.name == ln).get
      val rt = tables.find(_.name == rn).get
      val left = rnd.nextInt(3) == 0
      val joinType = if (left) "LEFT" else "INNER"
      val rightFilter =
        if (left || rnd.nextBoolean()) Some(boolExpr(rt)) else None
      val lCols = lt.cols.filterNot(_.name == lk)
      val rCols = rt.cols.filterNot(_.name == rk)
      val merged = TableMeta(s"${ln}_${rn}_using",
        ColMeta("k_u", TInt) +: (lCols ++ rCols),
        // the key survives as k_u; left tiebreaks keep their names unless
        // the key itself was one — substitute it
        lt.tie.map(c => if (c == lk) "k_u" else c) ++
          (if (left) Nil else rt.tie.map(c => if (c == rk) "k_u" else c)))
      val lSql = s"(SELECT $lk AS k_u, ${lCols.map(_.name).mkString(", ")} " +
        s"FROM $ln) AS lu"
      val rBase = rightFilter match {
        case Some(f) => s"(SELECT * FROM $rn WHERE ${f.sql})"
        case None    => rn
      }
      val rSql = s"(SELECT $rk AS k_u, ${rCols.map(_.name).mkString(", ")} " +
        s"FROM $rBase AS $rn) AS ru"
      Src(
        (s, dir) => {
          val l = tableDf(ln)(s, dir).withColumnRenamed(lk, "k_u")
          val r0 = tableDf(rn)(s, dir)
          val r = rightFilter.map(f => r0.filter(f.spark)).getOrElse(r0)
            .withColumnRenamed(rk, "k_u")
          l.join(r, Seq("k_u"), joinType.toLowerCase)
        },
        s"$lSql $joinType JOIN $rSql USING (k_u)",
        merged, s"using/$ln-$joinType-$rn")
    }

    /** CORRELATED EXISTS / NOT EXISTS source: the subquery correlates on
      * the FK equality AND a non-equi comparison against an OUTER column —
      * the decorrelation class (rewrite to semi/anti join with a compound
      * condition) where engines have historically diverged. The Spark twin
      * IS the decorrelated plan (left_semi/left_anti on the compound
      * condition); DuckDB plans the textual EXISTS itself — a divergence
      * in either engine's null/comparison handling surfaces as a row diff.
      * NULL comparison semantics agree by construction: a NULL-valued
      * condition row satisfies neither EXISTS nor the semi join, and
      * NOT EXISTS keeps exactly the rows the anti join keeps.
      */
    private def existsSource(): Src = {
      val (ln, lk, rn, rk) = pick(joins)
      val lt = tables.find(_.name == ln).get
      val rt = tables.find(_.name == rn).get
      val anti = rnd.nextBoolean()
      val rightFilter = boolExpr(rt)
      // non-equi correlation: inner int col <op> OUTER int col
      val ri = intCol(rt); val li = intCol(lt)
      val (op, f) = pick(cmps)
      val ex = if (anti) "NOT EXISTS" else "EXISTS"
      Src(
        (s, dir) => tableDf(ln)(s, dir).join(
          tableDf(rn)(s, dir).filter(rightFilter.spark),
          col(lk) === col(rk) && f(ri.spark, li.spark),
          if (anti) "left_anti" else "left_semi"),
        ln, lt, s"${if (anti) "not-exists" else "exists"}/$ln-$rn",
        preWhere = Some(
          s"$ex (SELECT 1 FROM $rn WHERE $rk = $lk " +
            s"AND ${rightFilter.sql} AND (${ri.sql} $op ${li.sql}))"))
    }

    /** `requireTie = true` (the windowed shape) excludes FULL OUTER joins:
      * right-only rows carry all-NULL left tiebreak columns, so the
      * source's tie would no longer be a total order.
      */
    private def source(requireTie: Boolean = false): Src = {
      val roll = rnd.nextInt(12)
      if (roll == 7) return chainSource()
      if (roll == 8) return semiSource()
      if (roll == 10) return existsSource()
      if (roll == 11) return usingJoinSource()
      if (roll <= 2 || roll == 9) {
        val (ln, lk, rn, rk) = pick(joins)
        val lt = tables.find(_.name == ln).get
        val rt = tables.find(_.name == rn).get
        val joinType =
          if (roll == 9 && !requireTie) "full"
          else if (rnd.nextInt(3) == 0) "left" else "inner"
        // optionally pre-filter the RIGHT side so left joins actually
        // produce null-extended rows (and inner joins lose rows); for a
        // FULL join also pre-filter the LEFT side so left-null rows exist
        val rightFilter =
          if (joinType == "full" || rnd.nextInt(2) == 0) Some(boolExpr(rt))
          else None
        val leftFilter =
          if (joinType == "full") Some(boolExpr(lt)) else None
        val mergedTie = joinType match {
          case "inner" => lt.tie ++ rt.tie
          case "left"  => lt.tie
          case _       => Nil // full outer: no non-null unique tie exists
        }
        val merged = TableMeta(s"${ln}_$rn", lt.cols ++ rt.cols, mergedTie)
        val sqlJoin = if (joinType == "full") "FULL" else joinType.toUpperCase
        val lhsSql = leftFilter match {
          case Some(f) => s"(SELECT * FROM $ln WHERE ${f.sql}) AS $ln"
          case None    => ln
        }
        val fromSql = rightFilter match {
          case Some(f) =>
            s"$lhsSql $sqlJoin JOIN " +
              s"(SELECT * FROM $rn WHERE ${f.sql}) AS $rn ON $lk = $rk"
          case None =>
            s"$lhsSql $sqlJoin JOIN $rn ON $lk = $rk"
        }
        Src(
          (s, dir) => {
            val l0 = tableDf(ln)(s, dir)
            val l = leftFilter.map(f => l0.filter(f.spark)).getOrElse(l0)
            val r0 = tableDf(rn)(s, dir)
            val r = rightFilter.map(f => r0.filter(f.spark)).getOrElse(r0)
            l.join(r, col(lk) === col(rk), joinType)
          },
          fromSql, merged, s"$ln-$joinType-$rn")
      } else {
        val t = pick(tables)
        Src(tableDf(t.name), t.name, t, t.name)
      }
    }

    // -------------------------------------------------------------------
    // Query shapes
    // -------------------------------------------------------------------

    def query(): FuzzQuery = rnd.nextInt(23) match {
      case 0 | 1 | 2     => filterProject()
      case 3 | 4 | 5 | 6 => groupAgg()
      case 7 | 8         => windowed()
      case 9 | 10        => aggNoGroup()
      case 11            => topK()
      case 12 | 13       => setOp()
      case 14 | 15       => groupingSets()
      case 16 | 17       => rankFilter()
      case 18            => outerAgg()
      case 19            => scalarSubquery()
      case 20 | 21       => decimalAgg()
      case _             => reusedComputed()
    }

    /** DECIMAL-typed expression built EXACTLY (from an integral column —
      * never by casting a double, whose .xx5 rounding direction differs
      * between engines): base DECIMAL(18,3), optionally scaled by an exact
      * 3-dp literal or summed with a second decimal. Result precisions
      * differ between engines (Spark caps at 38 with its own growth rules,
      * DuckDB widens differently) but the VALUES are exact rationals —
      * fmt's trailing-zero normalization makes them comparable.
      */
    private def decimalExpr(t: TableMeta): E = {
      val c = pick(t.cols.filter(c => c.typ == TInt && !c.money))
      val base = E(col(c.name).cast("long").cast("decimal(18,3)"),
        s"CAST(CAST(${c.name} AS BIGINT) AS DECIMAL(18,3))", TInt)
      rnd.nextInt(3) match {
        case 0 => base
        case 1 =>
          val m = new java.math.BigDecimal(
            s"${rnd.nextInt(9)}.${100 + rnd.nextInt(900)}")
          E(base.spark * lit(m), s"(${base.sql} * ${m.toPlainString})", TInt)
        case _ =>
          val c2 = pick(t.cols.filter(c => c.typ == TInt && !c.money))
          E(base.spark + col(c2.name).cast("long").cast("decimal(18,3)"),
            s"(${base.sql} + CAST(CAST(${c2.name} AS BIGINT) AS DECIMAL(18,3)))",
            TInt)
      }
    }

    /** Grouped DECIMAL aggregates — the one type family the grammar
      * previously avoided: sum/min/max over exact decimals, where the
      * engines' decimal-precision growth rules diverge hardest (values
      * must still agree exactly).
      */
    private def decimalAgg(): FuzzQuery = {
      val src = source()
      val filter = if (rnd.nextBoolean()) Some(boolExpr(src.meta)) else None
      val key = groupKey(src.meta)
      val ds = (0 until (1 + rnd.nextInt(2))).map(_ => decimalExpr(src.meta))
      val names = ds.indices.map(i => s"d$i")
      val aggs = ds.map { d =>
        rnd.nextInt(3) match {
          case 0 => (sum(d.spark), s"sum(${d.sql})")
          case 1 => (min(d.spark), s"min(${d.sql})")
          case _ => (max(d.spark), s"max(${d.sql})")
        }
      }
      val sql = s"SELECT ${key.sql} AS k0, " +
        aggs.zip(names).map { case ((_, a), n) => s"$a AS $n" }.mkString(", ") +
        s" FROM ${src.from}${src.whereSql(filter.map(_.sql))} GROUP BY k0"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val base = filter.foldLeft(src.build(s, dir))((d, f) => d.filter(f.spark))
          base.groupBy(key.spark.as("k0"))
            .agg(aggs.head._1.as(names.head),
              aggs.tail.zip(names.tail).map { case ((a, _), n) => a.as(n) }: _*)
        },
        s"decimal-agg/${src.desc}")
    }

    /** Reused computed column (the LATERAL-alias shape): a derived value
      * is named ONCE in an inner projection and consumed several times —
      * including inside CASE and modular arithmetic — by the outer one.
      * Exercises common-subexpression/projection-collapse paths; DuckDB
      * executes the textual nested SELECT.
      */
    private def reusedComputed(): FuzzQuery = {
      val src = source()
      val filter = if (rnd.nextBoolean()) Some(boolExpr(src.meta)) else None
      val v = intExpr(src.meta)
      val ids = src.meta.tie.map(c =>
        (col(c).cast("long"), s"CAST($c AS BIGINT)"))
      val idNames = ids.indices.map(i => s"id$i")
      val thr = rnd.nextInt(2000).toLong
      val m = 2 + rnd.nextInt(9)
      // full-outer sources carry no unique tie (ids empty): the projection
      // is then just the computed column — duplicates are fine, the
      // compare is multiset equality
      val idSelect = ids.zip(idNames)
        .map { case ((_, s0), n) => s"$s0 AS $n" } :+ s"${v.sql} AS v"
      val innerSql = s"SELECT ${idSelect.mkString(", ")}" +
        s" FROM ${src.from}${src.whereSql(filter.map(_.sql))}"
      val outSelect = idNames ++ Seq("v",
        s"(v + v) AS v2", s"(abs(v) % $m) AS v3",
        s"(CASE WHEN v > $thr THEN v ELSE -v END) AS v4")
      val sql = s"SELECT ${outSelect.mkString(", ")} FROM ($innerSql)"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val base = filter.foldLeft(src.build(s, dir))((d, f) => d.filter(f.spark))
          val inner = base.select(ids.zip(idNames)
            .map { case ((c0, _), n) => c0.as(n) } :+ v.spark.as("v"): _*)
          inner.select(idNames.map(col) ++ Seq(col("v"),
            (col("v") + col("v")).as("v2"),
            (abs(col("v")) % m).as("v3"),
            when(col("v") > thr, col("v")).otherwise(-col("v")).as("v4")): _*)
        },
        s"reused-computed/${src.desc}")
    }

    /** Aggregation over the NULL-EXTENDED side of a LEFT join: group by a
      * LEFT-table key, aggregate ONLY right-side columns — all-null groups
      * must yield count(col)=0 next to sum/min/max=NULL, the corner where
      * "count counts rows" vs "aggregates skip nulls" intuitions collide.
      * The right side is always pre-filtered so null-extended groups
      * actually exist.
      */
    private def outerAgg(): FuzzQuery = {
      val (ln, lk, rn, rk) = pick(joins)
      val lt = tables.find(_.name == ln).get
      val rt = tables.find(_.name == rn).get
      val rightFilter = boolExpr(rt)
      val key = groupKey(lt)
      val rc = pick(rt.cols)
      val ra = intExpr(rt)
      val fromSql = s"$ln LEFT JOIN " +
        s"(SELECT * FROM $rn WHERE ${rightFilter.sql}) AS $rn ON $lk = $rk"
      val sql = s"SELECT ${key.sql} AS k0, " +
        s"CAST(count(*) AS BIGINT) AS n_rows, " +
        s"CAST(count(${rc.name}) AS BIGINT) AS n_right, " +
        s"CAST(sum(${ra.sql}) AS BIGINT) AS sum_right, " +
        s"CAST(min(${ra.sql}) AS BIGINT) AS min_right " +
        s"FROM $fromSql GROUP BY k0"
      FuzzQuery(seed, sql,
        (s, dir) => tableDf(ln)(s, dir)
          .join(tableDf(rn)(s, dir).filter(rightFilter.spark),
            col(lk) === col(rk), "left")
          .groupBy(key.spark.as("k0"))
          .agg(count(lit(1)).as("n_rows"),
            count(col(rc.name)).as("n_right"),
            sum(ra.spark).as("sum_right"),
            min(ra.spark).as("min_right")),
        s"outer-agg/$ln-$rn")
    }

    /** CORRELATED SCALAR SUBQUERY in the projection:
      * `(SELECT agg(x) FROM r WHERE r.k = l.k AND f)` — empty correlation
      * groups must surface NULL, not 0. The Spark twin is the decorrelated
      * plan (left join against the pre-aggregated subquery), the engines'
      * canonical rewrite; DuckDB executes the textual subquery.
      */
    private def scalarSubquery(): FuzzQuery = {
      val (ln, lk, rn, rk) = pick(joins)
      val lt = tables.find(_.name == ln).get
      val rt = tables.find(_.name == rn).get
      val rightFilter = boolExpr(rt)
      val ra = intExpr(rt)
      val (aggSql, aggCol): (String, Column) = rnd.nextInt(3) match {
        case 0 => (s"CAST(sum(${ra.sql}) AS BIGINT)", sum(ra.spark))
        case 1 => (s"CAST(max(${ra.sql}) AS BIGINT)", max(ra.spark))
        case _ => (s"CAST(min(${ra.sql}) AS BIGINT)", min(ra.spark))
      }
      val keyCols = lt.tie.map(c => E(col(c).cast("long"),
        s"CAST($c AS BIGINT)", TInt))
      val names = keyCols.indices.map(i => s"c$i")
      val sql = s"SELECT ${keyCols.zip(names)
        .map { case (e, n) => s"${e.sql} AS $n" }.mkString(", ")}, " +
        s"(SELECT $aggSql FROM $rn WHERE $rk = $lk AND ${rightFilter.sql}) AS sub " +
        s"FROM $ln"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val sub = tableDf(rn)(s, dir).filter(rightFilter.spark)
            .groupBy(col(rk)).agg(aggCol.as("sub"))
          tableDf(ln)(s, dir)
            .join(sub, col(lk) === col(rk), "left")
            .select(keyCols.zip(names)
              .map { case (e, n) => e.spark.as(n) } :+ col("sub"): _*)
        },
        s"scalar-subquery/$ln-$rn")
    }

    /** QUALIFY-style top-k per group: aggregate on two keys, rank within
      * k0-partitions by the aggregate (k1 as the tiebreak — unique within
      * the partition after grouping, so the rank is total), keep rn <= k.
      * Exercises the window-over-aggregate + rank-predicate plan class
      * (Spark's WindowGroupLimit pushdown path).
      */
    private def rankFilter(): FuzzQuery = {
      val src = source()
      val k0 = groupKey(src.meta); val k1 = groupKey(src.meta)
      val agg = aggExpr(src.meta)
      val k = 1 + rnd.nextInt(4)
      val desc = rnd.nextBoolean()
      val dirSql = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
      val over = s"OVER (PARTITION BY k0 ORDER BY a0 $dirSql, k1 ASC NULLS FIRST)"
      val inner = s"SELECT k0, k1, a0, CAST(row_number() $over AS BIGINT) AS rn " +
        s"FROM (SELECT ${k0.sql} AS k0, ${k1.sql} AS k1, ${agg.sql} AS a0 " +
        s"FROM ${src.from}${src.whereSql(None)} GROUP BY k0, k1)"
      val sql = s"SELECT k0, k1, a0, rn FROM ($inner) WHERE rn <= $k"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val grouped = src.build(s, dir)
            .groupBy(k0.spark.as("k0"), k1.spark.as("k1"))
            .agg(agg.spark.as("a0"))
          val ord = (if (desc) col("a0").desc_nulls_last
                     else col("a0").asc_nulls_first) +: Seq(col("k1").asc_nulls_first)
          grouped
            .withColumn("rn",
              row_number().over(Window.partitionBy(col("k0")).orderBy(ord: _*))
                .cast("long"))
            .filter(col("rn") <= k)
        },
        s"rank-filter/${src.desc}")
    }

    /** Set operations between two filtered projections of the same table:
      * UNION ALL (multiset), UNION / INTERSECT / EXCEPT (all DISTINCT
      * semantics in BOTH engines — Spark's intersect/except are the SQL
      * standard's DISTINCT variants, as are DuckDB's bare keywords). NULL
      * keys compare EQUAL inside set ops in both engines (set-op grouping
      * semantics, not predicate semantics), so no guard is needed.
      */
    private def setOp(): FuzzQuery = {
      val t = pick(tables)
      val es = (0 until (1 + rnd.nextInt(3))).map(_ => scalarExpr(t))
      val names = es.indices.map(i => s"c$i")
      val f1 = boolExpr(t); val f2 = boolExpr(t)
      val (opSql, opDf): (String, (DataFrame, DataFrame) => DataFrame) =
        rnd.nextInt(4) match {
          case 0 => ("UNION ALL", (a, b) => a.union(b))
          case 1 => ("UNION", (a, b) => a.union(b).distinct())
          case 2 => ("INTERSECT", (a, b) => a.intersect(b))
          case _ => ("EXCEPT", (a, b) => a.except(b))
        }
      def branch(fSql: String): String =
        s"SELECT ${es.zip(names).map { case (e, n) => s"${e.sql} AS $n" }
          .mkString(", ")} FROM ${t.name} WHERE $fSql"
      val sql = s"${branch(f1.sql)} $opSql ${branch(f2.sql)}"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val base = tableDf(t.name)(s, dir)
          def side(f: E): DataFrame = base.filter(f.spark)
            .select(es.zip(names).map { case (e, n) => e.spark.as(n) }: _*)
          opDf(side(f1), side(f2))
        },
        s"set-op/${t.name}")
    }

    /** GROUP BY ROLLUP / CUBE with explicit GROUPING() markers. The keys
      * are pre-projected into named columns (k0, k1) on both sides so the
      * grouping markers reference plain columns; the markers disambiguate
      * rollup-generated NULL subtotal keys from genuine NULL key values.
      */
    private def groupingSets(): FuzzQuery = {
      val src = source()
      val filter = if (rnd.nextBoolean()) Some(boolExpr(src.meta)) else None
      val keys = Seq(groupKey(src.meta), groupKey(src.meta))
      val kn = Seq("k0", "k1")
      val aggs = (0 until (1 + rnd.nextInt(2))).map(_ => aggExpr(src.meta))
      val an = aggs.indices.map(i => s"a$i")
      val cube = rnd.nextBoolean()
      val mode = if (cube) "CUBE" else "ROLLUP"
      val innerSql = s"SELECT *, ${keys.zip(kn)
        .map { case (e, n) => s"${e.sql} AS $n" }.mkString(", ")} " +
        s"FROM ${src.from}${src.whereSql(filter.map(_.sql))}"
      // HAVING count(*) > 0 makes the twin faithful to SPARK's deviation
      // from the standard: on an EMPTY input, ROLLUP/CUBE's () grouping
      // set emits a grand-total row (count 0) in DuckDB/PostgreSQL, but
      // Spark's Expand-based implementation replicates input rows per
      // grouping set — zero rows in, zero groups out. Every real group
      // has count(*) >= 1, so the filter only ever removes that artifact.
      val sql = s"SELECT k0, k1, " +
        s"CAST(GROUPING(k0) AS BIGINT) AS g0, " +
        s"CAST(GROUPING(k1) AS BIGINT) AS g1, " +
        s"${aggs.zip(an).map { case (e, n) => s"${e.sql} AS $n" }.mkString(", ")} " +
        s"FROM ($innerSql) GROUP BY $mode(k0, k1) HAVING count(*) > 0"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val base0 = src.build(s, dir)
          val base1 = filter.map(f => base0.filter(f.spark)).getOrElse(base0)
          val base = base1
            .withColumn("k0", keys(0).spark)
            .withColumn("k1", keys(1).spark)
          val grouped =
            if (cube) base.cube(col("k0"), col("k1"))
            else base.rollup(col("k0"), col("k1"))
          grouped.agg(
            grouping(col("k0")).cast("long").as("g0"),
            grouping(col("k1")).cast("long").as("g1") +:
              aggs.zip(an).map { case (e, n) => e.spark.as(n) }: _*)
            .select((Seq("k0", "k1", "g0", "g1") ++ an).map(col): _*)
        },
        s"grouping-sets/${src.desc}")
    }

    private def filterProject(): FuzzQuery = {
      val src = source()
      val f = boolExpr(src.meta)
      val distinct = rnd.nextInt(4) == 0
      val es = (0 until (1 + rnd.nextInt(4))).map(_ => scalarExpr(src.meta))
      val names = es.indices.map(i => s"c$i")
      val sql = s"SELECT ${if (distinct) "DISTINCT " else ""}" +
        s"${es.zip(names).map { case (e, n) => s"${e.sql} AS $n" }
          .mkString(", ")} FROM ${src.from}${src.whereSql(Some(f.sql))}"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val sel = src.build(s, dir).filter(f.spark)
            .select(es.zip(names).map { case (e, n) => e.spark.as(n) }: _*)
          if (distinct) sel.distinct() else sel
        },
        s"filter-project/${src.desc}")
    }

    private def groupAgg(): FuzzQuery = {
      val src = source()
      val filter = if (rnd.nextBoolean()) Some(boolExpr(src.meta)) else None
      val keys = (0 until (1 + rnd.nextInt(2))).map(_ => groupKey(src.meta))
      val aggs = (0 until (1 + rnd.nextInt(3))).map(_ => aggExpr(src.meta))
      val kn = keys.indices.map(i => s"k$i")
      val an = aggs.indices.map(i => s"a$i")
      // HAVING through the post-aggregation filter (the SQL twin renders a
      // true HAVING; Spark filters the agg output — same semantics)
      // only over INT aggregates: a long literal against a string/date agg
      // would ANSI-cast-error on the Spark side (and mean nothing anyway)
      val intAggIdxs = aggs.indices.filter(i => aggs(i).typ == TInt)
      val having: Option[(Int, Long)] =
        if (intAggIdxs.nonEmpty && rnd.nextInt(3) == 0)
          Some((pick(intAggIdxs), 1L + rnd.nextInt(20)))
        else None
      val havingSql = having
        .map { case (i, v) => s" HAVING ${aggs(i).sql} > $v" }.getOrElse("")
      val sql = s"SELECT ${(keys.zip(kn) ++ aggs.zip(an))
        .map { case (e, n) => s"${e.sql} AS $n" }.mkString(", ")} " +
        s"FROM ${src.from}${src.whereSql(filter.map(_.sql))} " +
        s"GROUP BY ${keys.map(_.sql).mkString(", ")}$havingSql"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val base0 = src.build(s, dir)
          val base = filter.map(f => base0.filter(f.spark)).getOrElse(base0)
          val agged = base
            .groupBy(keys.zip(kn).map { case (e, n) => e.spark.as(n) }: _*)
            .agg(aggs.head.spark.as(an.head),
              aggs.tail.zip(an.tail).map { case (e, n) => e.spark.as(n) }: _*)
          having.map { case (i, v) => agged.filter(col(an(i)) > v) }
            .getOrElse(agged)
        },
        s"group-agg/${src.desc}")
    }

    /** Deterministic ordered top-K over a group aggregate: ORDER BY the
      * first aggregate (explicit nulls) then every group key — the keys
      * are unique per output row, so the order is total and LIMIT is
      * well-defined on both engines.
      */
    private def topK(): FuzzQuery = {
      val src = source()
      val keys = (0 until (1 + rnd.nextInt(2))).map(_ => groupKey(src.meta))
      val agg = aggExpr(src.meta)
      val kn = keys.indices.map(i => s"k$i")
      val k = 3 + rnd.nextInt(12)
      val desc = rnd.nextBoolean()
      val dirSql = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
      val sql = s"SELECT ${(keys.zip(kn).map { case (e, n) => s"${e.sql} AS $n" } :+
        s"${agg.sql} AS a0").mkString(", ")} " +
        s"FROM ${src.from}${src.whereSql(None)} " +
        s"GROUP BY ${keys.map(_.sql).mkString(", ")} " +
        s"ORDER BY a0 $dirSql, ${kn.map(n => s"$n ASC NULLS FIRST").mkString(", ")} " +
        s"LIMIT $k"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val ordCols = (if (desc) col("a0").desc_nulls_last
                         else col("a0").asc_nulls_first) +:
            kn.map(n => col(n).asc_nulls_first)
          src.build(s, dir)
            .groupBy(keys.zip(kn).map { case (e, n) => e.spark.as(n) }: _*)
            .agg(agg.spark.as("a0"))
            .orderBy(ordCols: _*)
            .limit(k)
        },
        s"top-k/${src.desc}")
    }

    private def aggNoGroup(): FuzzQuery = {
      val src = source()
      val filter = if (rnd.nextBoolean()) Some(boolExpr(src.meta)) else None
      val aggs = (0 until (1 + rnd.nextInt(3))).map(_ => aggExpr(src.meta))
      val an = aggs.indices.map(i => s"a$i")
      val sql = s"SELECT ${aggs.zip(an)
        .map { case (e, n) => s"${e.sql} AS $n" }.mkString(", ")} " +
        s"FROM ${src.from}${src.whereSql(filter.map(_.sql))}"
      FuzzQuery(seed, sql,
        (s, dir) => {
          val base0 = src.build(s, dir)
          val base = filter.map(f => base0.filter(f.spark)).getOrElse(base0)
          base.agg(aggs.head.spark.as(an.head),
            aggs.tail.zip(an.tail).map { case (e, n) => e.spark.as(n) }: _*)
        },
        s"scalar-agg/${src.desc}")
    }

    private def windowed(): FuzzQuery = {
      val src = source(requireTie = true)
      val filter = boolExpr(src.meta)
      val part = groupKey(src.meta)
      val ord = intExpr(src.meta)
      val desc = rnd.nextBoolean()
      // TOTAL order: the ranked expression then the source's unique key
      // columns, null placement EXPLICIT (Spark and DuckDB defaults differ)
      val ordSpark = (if (desc) ord.spark.desc_nulls_last
                      else ord.spark.asc_nulls_first) +:
        src.meta.tie.map(c => col(c).asc_nulls_first)
      val ordSql = (s"${ord.sql} ${if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"}" +:
        src.meta.tie.map(c => s"$c ASC NULLS FIRST")).mkString(", ")
      val w = Window.partitionBy(part.spark).orderBy(ordSpark: _*)
      val over = s"OVER (PARTITION BY ${part.sql} ORDER BY $ordSql)"
      // Frames are rendered EXPLICITLY as ROWS on both sides (sidesteps
      // the engines' differing default-frame conventions). The "total"
      // order is NOT total on lineitem — the synthetic table has duplicate
      // (l_orderkey, l_linenumber) pairs — so every frame aggregate also
      // appends ITS OWN input expression as a final order key: remaining
      // ties are then identical in every projected column AND the summed
      // value, making prefix/sliding aggregates permutation-invariant.
      // (rank/lag/lead/first_value need no such guard: they return the
      // ordered expression itself, which ties by construction.)
      def overFrame(a: E, frameSpark: (Long, Long), frameSql: String): (
          org.apache.spark.sql.expressions.WindowSpec, String) =
        (Window.partitionBy(part.spark)
          .orderBy(ordSpark :+ a.spark.asc_nulls_first: _*)
          .rowsBetween(frameSpark._1, frameSpark._2),
          s"OVER (PARTITION BY ${part.sql} ORDER BY $ordSql, " +
            s"${a.sql} ASC NULLS FIRST $frameSql)")
      val wfn = rnd.nextInt(9) match {
        case 0 => E(row_number().over(w).cast("long"),
          s"CAST(row_number() $over AS BIGINT)", TInt)
        case 1 => E(rank().over(w).cast("long"),
          s"CAST(rank() $over AS BIGINT)", TInt)
        case 2 => E(dense_rank().over(w).cast("long"),
          s"CAST(dense_rank() $over AS BIGINT)", TInt)
        case 3 => E(lag(ord.spark, 1).over(w),
          s"lag(${ord.sql}, 1) $over", TInt)
        case 4 => E(lead(ord.spark, 1).over(w),
          s"lead(${ord.sql}, 1) $over", TInt)
        case 5 => // running sum over an explicit ROWS frame
          val a = intExpr(src.meta)
          val (ws, os) = overFrame(a,
            (Window.unboundedPreceding, Window.currentRow),
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
          E(sum(a.spark).over(ws), s"CAST(sum(${a.sql}) $os AS BIGINT)", TInt)
        case 6 => // sliding k-row trailing frame
          val a = intExpr(src.meta); val k = 1 + rnd.nextInt(5)
          val (ws, os) = overFrame(a, (-k.toLong, Window.currentRow),
            s"ROWS BETWEEN $k PRECEDING AND CURRENT ROW")
          E(sum(a.spark).over(ws), s"CAST(sum(${a.sql}) $os AS BIGINT)", TInt)
        case 7 => // first_value over the running frame (RESPECT NULLS both)
          val (ws, os) = overFrame(ord,
            (Window.unboundedPreceding, Window.currentRow),
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
          E(first(ord.spark).over(ws), s"first_value(${ord.sql}) $os", TInt)
        case _ =>
          val a = intExpr(src.meta)
          E(sum(a.spark).over(Window.partitionBy(part.spark)),
            s"CAST(sum(${a.sql}) OVER (PARTITION BY ${part.sql}) AS BIGINT)",
            TInt)
      }
      val keyCols = src.meta.tie.map(c => E(col(c).cast("long"),
        s"CAST($c AS BIGINT)", TInt))
      val es = keyCols :+ part :+ ord :+ wfn
      val names = es.indices.map(i => s"c$i")
      val selectList = es.zip(names)
        .map { case (e, n) => s"${e.sql} AS $n" }.mkString(", ")
      // HOUSE RULE (round-14 fuzz find, seed 101008): DuckDB 1.0.0
      // computes windows DIRECTLY over an OUTER join incorrectly when
      // window expressions derive from the join's null-extended side —
      // the result is both WRONG (disagrees with the ground truth an
      // explicit prefix aggregation gives, which Spark matches) and
      // run-to-run NON-DETERMINISTIC under threads > 1; the same shape
      // also shows unsound IS-NULL pushdown below the LEFT JOIN. A
      // MATERIALIZED CTE fence between the join and the window restores
      // correct, stable results while keeping the shape in coverage.
      val outerJoined = src.from.contains(" LEFT JOIN ") ||
        src.from.contains(" FULL JOIN ")
      val sql =
        if (!outerJoined)
          s"SELECT $selectList FROM ${src.from}${src.whereSql(Some(filter.sql))}"
        else
          s"WITH __wsrc AS MATERIALIZED (SELECT * FROM ${src.from}" +
            s"${src.whereSql(Some(filter.sql))}) " +
            s"SELECT $selectList FROM __wsrc"
      FuzzQuery(seed, sql,
        (s, dir) => src.build(s, dir).filter(filter.spark)
          .select(es.zip(names).map { case (e, n) => e.spark.as(n) }: _*),
        s"window/${src.desc}")
    }
  }
}
