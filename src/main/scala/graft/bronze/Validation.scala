package graft.bronze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation rule engine — the core of the reference's
  * Bronze layer.
  *
  * The reference chains `F.when(cond, reason).when(...)` per table
  * (Meta_Guideline.md:930-947, 1124-1148, 1286-1302); first matching rule
  * wins, unmatched rows are valid. Rules in the reference: null natural key,
  * empty string, `length(country_code) != 2`, `updated_ts < created_ts`,
  * `start_ts > deadline_ts`, negative counters, tag > 100 chars
  * (requirements/meta/meta_module_06_requirements.md:56-57).
  *
  * Here a rule is `(violation Column, reason String)` and the chain is a
  * fold into a single `when` expression — pure Catalyst, fully codegen'd,
  * no UDFs, evaluated in one pass over the data.
  */
object Validation {

  /** A single validation rule: rows where `violation` is true are rejected
    * with `reason`. `refs` lists the columns the rule reads (lets callers
    * skip rules whose columns aren't present at a given pipeline stage).
    */
  final case class Rule(reason: String, violation: Column, refs: Seq[String] = Nil)

  /** Fold rules into one when-chain; first matching rule wins; `null` for
    * valid rows. O(1) passes regardless of rule count.
    */
  def rejectReason(rules: Seq[Rule]): Column = {
    require(rules.nonEmpty, "at least one rule")
    val chain = rules.tail.foldLeft(when(rules.head.violation, lit(rules.head.reason))) {
      case (acc, r) => acc.when(r.violation, lit(r.reason))
    }
    chain.otherwise(lit(null).cast("string"))
  }

  /** Common reference rules, parameterized. */
  def notNull(c: String): Rule =
    Rule(s"${c}_is_null", col(c).isNull, Seq(c))
  def notEmpty(c: String): Rule =
    Rule(s"${c}_is_empty", trim(col(c)) === "", Seq(c))
  def fixedLength(c: String, n: Int): Rule =
    Rule(s"${c}_bad_length", col(c).isNotNull && length(col(c)) =!= n, Seq(c))
  def nonNegative(c: String): Rule =
    Rule(s"${c}_negative", col(c) < 0, Seq(c))
  def orderedPair(lo: String, hi: String): Rule =
    Rule(s"${hi}_before_$lo", col(hi) < col(lo), Seq(lo, hi))
  def maxLength(c: String, n: Int): Rule =
    Rule(s"${c}_too_long", length(col(c)) > n, Seq(c))

  /** Split one pass into (valid, rejects-with-reason). The input should be
    * cached by the caller if both sides trigger separate actions — the
    * reference recomputes lineage per action; we don't have to.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("reject_reason", rejectReason(rules))
    val valid   = tagged.filter(col("reject_reason").isNull).drop("reject_reason")
    val rejects = tagged.filter(col("reject_reason").isNotNull)
    (valid, rejects)
  }

  /** Tag rows instead of splitting — single output, oracle-friendly, and the
    * building block `split` uses.
    */
  def tagged(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("reject_reason", rejectReason(rules))

  final case class DqSummary(table: String, input: Long, valid: Long, rejected: Long) {
    def rejectionRate: Double = if (input == 0) 0.0 else rejected.toDouble / input
  }

  /** Count-based DQ metrics in ONE job (conditional aggregation), not three
    * separate `count()` actions like the reference (Meta_Guideline.md:949-951).
    */
  def summarize(table: String, taggedDf: DataFrame): DqSummary = {
    val row = taggedDf
      .agg(
        count(lit(1)).as("input"),
        count(col("reject_reason")).as("rejected")
      )
      .head()
    val input    = row.getLong(0)
    val rejected = row.getLong(1)
    DqSummary(table, input, input - rejected, rejected)
  }

  /** Circuit breaker: hard-fail when rejection rate exceeds the gate
    * (reference: 10% — requirements/...:60, Meta_Guideline.md:957-967).
    */
  def circuitBreak(s: DqSummary, maxRate: Double = 0.10): Unit =
    if (s.rejectionRate > maxRate)
      throw new IllegalStateException(
        f"Circuit breaker: ${s.table} rejection rate ${s.rejectionRate}%.4f > $maxRate%.2f " +
          s"(${s.rejected}/${s.input} rows rejected)"
      )

  /** Top-K reject reasons (reference: top-5, Meta_Guideline.md:989-993).
    * `orderBy(desc).limit` compiles to TakeOrderedAndProject — no global sort
    * materialized. Deterministic tie-break on the reason string.
    */
  def topRejectReasons(rejects: DataFrame, k: Int = 5): DataFrame =
    rejects
      .groupBy("reject_reason")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("reject_reason"))
      .limit(k)
}
