package graft

import java.sql.DriverManager

import graft.fuzz.DiffRunner
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import scala.util.Random

/** Differential fuzz for the NATIVE TEXT KERNELS: the corpus gate runs
  * them over `documents.text` (realistic but fixed); this spec runs the
  * same kernel-vs-DuckDB-replica comparison over ADVERSARIAL generated
  * strings — empty, whitespace-only (every char of the explicit WS
  * class), exotic unicode (combining marks, special-casing Σ/İ/ß, CJK),
  * astral code points (emoji = UTF-16 surrogate pairs — the classic
  * divergence spot for anything that iterates chars instead of code
  * points), long runs, and seeded random mixtures.
  *
  * The strings travel to DuckDB as PARQUET (never SQL literals), so both
  * engines read identical bytes. The replicas are the same fragments the
  * oracle gate uses (q_sql_graft_text's four kernels).
  */
class KernelFuzzSpec extends SparkSpecBase {

  private val WsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val Atoms = Seq(
    "a", "Z", "9", "hello", "WORLD42", ".", ",", "!?", "#@-_", ":;",
    "é", "ß", "Σ", "İ", "ñ", "中", "日本語", "кир",
    "🎉", "👍🏽", "𝔘", // astral: surrogate pairs in UTF-16
    "é", // combining acute
    " " // NBSP — deliberately NOT in the whitespace class
  )

  private def randText(rnd: Random): String = {
    val n = rnd.nextInt(12)
    (0 until n).map { _ =>
      val atom = Atoms(rnd.nextInt(Atoms.length))
      val sep = if (rnd.nextInt(4) == 0) "" else {
        val k = 1 + rnd.nextInt(3)
        (0 until k).map(_ => WsChars(rnd.nextInt(WsChars.length))).mkString
      }
      atom + sep
    }.mkString
  }

  private val curated = Seq(
    "", " ", "\t\t", "\u000B\u000B", "\r\n\r\n", " \t\n\u000B\f\r ",
    "🎉🎉🎉", "a🎉b", "🎉 🎉\t🎉", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
    "ΣΣΣ σς", "İstanbul", "straße", "ﬁ", // ligature
    "a" * 500, ("ab " * 200).trim, "  ", "a b",
    "éé", "x y" // NBSP word join
  )

  test("text kernels match their DuckDB replicas on adversarial strings") {
    val rnd = new Random(20260814L)
    val texts = curated ++ (0 until 300).map(_ => randText(rnd))
    val rows = texts.zipWithIndex.map { case (t, i) => Row(i, t) }
    val schema = StructType(Seq(
      StructField("doc_id", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_kernel_fuzz"
    df.write.mode("overwrite").parquet(path)

    // Spark side: the registered SQL kernels over the written files
    spark.read.parquet(path).createOrReplaceTempView("kernel_fuzz")
    val sparkRows = spark.sql("""SELECT doc_id,
        graft_fingerprint(text) AS fp,
        graft_rolling_hash(text) AS rh,
        graft_token_count(text) AS n_tokens,
        graft_simhash(graft_token_hashes(text)) AS simhash
        FROM kernel_fuzz""").collect()
      .map(r => (0 until r.length).map(i => DiffRunner.fmt(r.get(i))))
      .sortBy(_.mkString("|"))

    // DuckDB side: q_sql_graft_text's replica fragments over the same bytes
    val ws = "[ \\t\\n\\x0B\\f\\r]"
    val sql =
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text, '$ws+'), x -> length(x) > 0) AS toks
         |  FROM read_parquet('$path/*.parquet')),
         |h AS (SELECT doc_id, text, toks,
         |  [('0x' || substr(md5(x), 1, 8))::BIGINT for x in toks] AS hv FROM t)
         |SELECT doc_id,
         |  md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp,
         |  CASE WHEN length(text) > 0 THEN
         |    list_reduce(
         |      list_prepend(0::BIGINT,
         |        [ord(substring(text, i, 1))::BIGINT for i in generate_series(1, length(text))]),
         |      (acc, x) -> (acc * 31 + x) % 1000000007)
         |  ELSE 0 END AS rh,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(list_sum([
         |    CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hv]) > 0
         |         THEN (1::BIGINT << j) ELSE 0 END
         |    for j in generate_series(0, 31)]) AS BIGINT) AS simhash
         |FROM h""".stripMargin
    val con = DriverManager.getConnection("jdbc:duckdb:")
    val duckRows =
      try {
        val st = con.createStatement()
        try {
          val rs = st.executeQuery(sql)
          val n = rs.getMetaData.getColumnCount
          val buf = scala.collection.mutable.ArrayBuffer[Seq[String]]()
          while (rs.next()) buf += (1 to n).map(i => DiffRunner.fmt(rs.getObject(i)))
          buf.toSeq.sortBy(_.mkString("|"))
        } finally st.close()
      } finally con.close()

    sparkRows.length shouldBe texts.length
    val diffs = sparkRows.zip(duckRows).filter { case (a, b) => a != b }
    withClue(diffs.take(5).map { case (a, b) =>
      s"spark=${a.mkString("|")}\n duck=${b.mkString("|")}\n"
    }.mkString) {
      diffs shouldBe empty
    }
  }
}
