package graft

import org.apache.spark.sql.functions._

import graft.functions.TextNativeExpressions
import graft.plans.CodegenAudit

/** The interpreted-fallback watchdog must (1) stay silent when the graft
  * kernels run inside WholeStageCodegen — the normal state every gated
  * query is in — and (2) fire loudly for each mechanism that de-compiles
  * them: plan-level eviction (codegen disabled / CodegenFallback
  * neighbors) and the hugeMethodLimit runtime fallback. A detector that
  * can't detect is worse than none: the round-5 driver bench showed the
  * kernels running 25x slower with zero functional signal.
  */
class CodegenAuditSpec extends SparkSpecBase {
  import spark.implicits._

  // repartition: a bare LocalRelation would be folded by
  // ConvertToLocalRelation at optimize time, evaluating the kernels away
  // before any physical plan exists — nothing left to audit
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "beta gamma delta epsilon zeta"),
    (3L, "one two three four five six")
  ).toDF("id", "text").repartition(2)

  private def kernelFrame = docs.select(
    $"id",
    TextNativeExpressions.rolling_hash_native($"text").as("rh"),
    TextNativeExpressions.word_ngrams_native($"text", 2).as("ng"))

  test("kernels inside WholeStageCodegen produce no findings") {
    val df = kernelFrame
    df.collect()
    CodegenAudit.audit(df) shouldBe empty
    noException should be thrownBy CodegenAudit.assertInCodegen(df)
  }

  test("plan-level eviction (wholeStage off) is reported as error") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val df = kernelFrame
      df.collect()
      val findings = CodegenAudit.audit(df)
      findings should not be empty
      all(findings.map(_.severity)) shouldBe "error"
      findings.map(_.reason).foreach(_ should include("outside"))
      an[IllegalArgumentException] should be thrownBy
        CodegenAudit.assertInCodegen(df)
    } finally spark.conf.unset("spark.sql.codegen.wholeStage")
  }

  test("hugeMethodLimit fallback is re-derived exactly as doExecute decides it") {
    // Dropping the limit below any real method size makes Spark itself
    // execute the span interpreted; the audit must reach the same verdict
    // from the same compile stats.
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "1")
    try {
      val df = kernelFrame
      df.collect()
      val findings = CodegenAudit.audit(df)
      findings should not be empty
      findings.map(_.severity) should contain("error")
      findings.map(_.reason).exists(_.contains("hugeMethodLimit")) shouldBe true
    } finally spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
  }

  test("non-graft plans are never flagged (no kernel, no finding)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val df = docs.select($"id", upper($"text").as("u"))
      df.collect()
      CodegenAudit.audit(df) shouldBe empty
    } finally spark.conf.unset("spark.sql.codegen.wholeStage")
  }

  test("listener audits the executed plan of a write action") {
    val l = CodegenAudit.attach(spark)
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      l.current.set("spec_probe")
      kernelFrame.write.format("noop").mode("overwrite").save()
      org.apache.spark.graftbridge.ListenerBridge.drain(sc)
      l.errors.get() should be > 0
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.listenerManager.unregister(l)
    }
  }
}
