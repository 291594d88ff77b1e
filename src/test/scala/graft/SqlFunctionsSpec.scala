package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** The SQL-callable function registry (`plans.SqlFunctions`, installed by
  * `GraftExtensions`): pure-SQL calls must produce values identical to the
  * Column-API formulations, and static parameters must fail with named
  * errors rather than silently misbehave.
  */
class SqlFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown Fox!"),
    (2L, "  leading and   trailing  "),
    (3L, ""),
    (4L, "unicode éè mixed 42")
  ).toDF("id", "text")

  test("SQL text kernels equal the Column API") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_fingerprint(text) AS fp, graft_rolling_hash(text) AS rh,
        |  graft_token_count(text) AS n,
        |  graft_simhash(transform(graft_tokens(text), t -> graft_hex_hash32(t))) AS sh
        |FROM sqlfn_docs""".stripMargin)
    val viaCol = docs.select($"id", fingerprint($"text").as("fp"),
      rollingHash($"text").as("rh"), tokenCount($"text").as("n"),
      simhash32(transform(tokens($"text"), hexHash32(_))).as("sh"))
    viaSql.collect().sortBy(_.getLong(0)) shouldBe viaCol.collect().sortBy(_.getLong(0))
  }

  test("graft_token_hashes (fused) equals the SQL lambda composition") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val rows = spark.sql(
      """SELECT id,
        |  graft_token_hashes(text) AS fused,
        |  transform(graft_tokens(text), t -> graft_hex_hash32(t)) AS composed
        |FROM sqlfn_docs""".stripMargin).collect()
    rows.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getSeq[Long](1) shouldBe r.getSeq[Long](2)
      }
    }
  }

  test("SQL vector kernels equal the Column API") {
    val vecs = Seq((1L, Array(0.25f, -1.5f, 3.0f)), (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("id", "emb")
      .withColumn("qv", graft.similarity.CosineTopK.quantize($"emb"))
    vecs.createOrReplaceTempView("sqlfn_vecs")
    val viaSql = spark.sql(
      """SELECT id, graft_long_dot(qv, qv) AS n2,
        |  graft_sign_lsh_bucket(qv, 6, 4096) AS b FROM sqlfn_vecs""".stripMargin)
    val viaCol = vecs.select($"id",
      graft.functions.VectorExpressions.long_dot($"qv", $"qv").as("n2"),
      graft.functions.VectorExpressions.sign_lsh_bucket($"qv", 6, 4096L).as("b"))
    viaSql.collect().sortBy(_.getLong(0)) shouldBe viaCol.collect().sortBy(_.getLong(0))
  }

  test("static parameters demand literal integers, with named errors") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_simhash(transform(graft_tokens(text), t -> graft_hex_hash32(t)), id)
          |FROM sqlfn_docs""".stripMargin).collect()
    }
    e.getMessage should include("literal integer")
    val a = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint(text, text) FROM sqlfn_docs").collect()
    }
    a.getMessage should include("expects 1 argument")
  }

  test("unregistered-name errors still surface normally") {
    docs.createOrReplaceTempView("sqlfn_docs")
    intercept[AnalysisException] {
      spark.sql("SELECT graft_nope(text) FROM sqlfn_docs").collect()
    }
  }
}
