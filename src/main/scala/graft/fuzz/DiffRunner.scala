package graft.fuzz

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/** Executes a [[QueryFuzzer.FuzzQuery]] on both engines and diffs the row
  * sets. The DuckDB side runs IN-PROCESS over the same parquet files
  * through `duckdb_jdbc` — the whole differential loop is one JVM, no
  * python glue.
  */
object DiffRunner {

  /** Canonical value formatting so Spark collect() values and DuckDB JDBC
    * values compare as strings: numbers through BigDecimal normalization
    * (Long vs BigInteger vs Int all meet there), dates via ISO toString,
    * NULL as a sentinel no real value can collide with.
    */
  def fmt(v: Any): String = v match {
    case null                    => "∅NULL"
    case d: java.sql.Date        => d.toString
    case d: java.time.LocalDate  => d.toString
    case b: Boolean              => b.toString
    case b: java.lang.Boolean    => b.toString
    case s: String               => s
    case n: java.lang.Number =>
      new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
    case other => other.toString
  }

  private def sortRows(rows: Seq[Seq[String]]): Seq[Seq[String]] =
    rows.sortBy(_.mkString(""))

  final case class Outcome(seed: Long, desc: String, ok: Boolean,
      sparkRows: Int, oracleRows: Int, error: Option[String])

  /** A reusable DuckDB connection with views over the sf directory's
    * parquet tables (create once; the fuzz loop runs hundreds of queries).
    */
  def openOracle(sfDir: String): java.sql.Connection = {
    val con = DriverManager.getConnection("jdbc:duckdb:")
    val st = con.createStatement()
    try {
      QueryFuzzer.tables.map(_.name).foreach { t =>
        st.execute(
          s"CREATE VIEW $t AS SELECT * FROM read_parquet('$sfDir/$t.parquet')")
      }
    } finally st.close()
    con
  }

  def run(spark: SparkSession, sfDir: String, con: java.sql.Connection,
      q: QueryFuzzer.FuzzQuery): Outcome = {
    try {
      val sparkRows = q.build(spark, sfDir).collect()
        .map(r => (0 until r.length).map(i => fmt(r.get(i))).toSeq).toSeq
      val st = con.createStatement()
      val oracleRows =
        try {
          val rs = st.executeQuery(q.sql)
          val n = rs.getMetaData.getColumnCount
          val buf = scala.collection.mutable.ArrayBuffer[Seq[String]]()
          while (rs.next()) buf += (1 to n).map(i => fmt(rs.getObject(i)))
          buf.toSeq
        } finally st.close()
      val a = sortRows(sparkRows)
      val b = sortRows(oracleRows)
      if (a == b)
        Outcome(q.seed, q.desc, ok = true, a.size, b.size, None)
      else {
        val firstDiff = a.zipAll(b, Seq("<missing>"), Seq("<missing>"))
          .find { case (x, y) => x != y }
          .map { case (x, y) => s"spark=${x.mkString("|")} oracle=${y.mkString("|")}" }
          .getOrElse(s"row counts ${a.size} vs ${b.size}")
        Outcome(q.seed, q.desc, ok = false, a.size, b.size, Some(firstDiff))
      }
    } catch {
      case e: Throwable =>
        Outcome(q.seed, q.desc, ok = false, -1, -1,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }
}
