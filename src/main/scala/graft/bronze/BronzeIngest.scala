package graft.bronze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Contracts.{TableContract, TsFormat}
import graft.silver.Impute

/** Bronze ingestion: contract-schema CSV scan, snake_case rename fold,
  * audit metadata, type coercion.
  *
  * Reference: CSV options header/multiLine/escape='"' with explicit
  * StructType (Meta_Guideline.md:905-910, 1093-1098); rename loop (:916-917,
  * 1104-1105); metadata columns ingest_ts/run_date/source_file/source_system
  * (:920-923); `to_timestamp` coercion (:926-927, 1108-1111).
  *
  * Determinism (SURVEY §7.4.3): the clock and run id are PARAMETERS, not
  * inline `current_timestamp()` — tests and idempotent re-runs inject fixed
  * values; production passes the real clock.
  *
  * Spark 4.x note: ANSI mode is on by default, so coercion uses
  * `try_to_timestamp` to reproduce the reference's null-on-malformed
  * semantics instead of throwing (SURVEY §7.4.5).
  */
object BronzeIngest {

  /** One option set for every contract CSV read — batch AND streaming must
    * parse identically (quoted multi-line fields, `""` escapes).
    */
  val CsvOptions: Map[String, String] = Map(
    "header"    -> "true",
    "multiLine" -> "true",
    "escape"    -> "\""
  )

  def readCsv(spark: SparkSession, path: String, contract: TableContract): DataFrame =
    spark.read.options(CsvOptions).schema(contract.raw).csv(path)

  def rename(df: DataFrame, contract: TableContract): DataFrame =
    contract.rename.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Audit metadata; `ingestTs` injected for determinism. */
  def withMetadata(
      df: DataFrame,
      runDate: String,
      sourceSystem: String,
      ingestTs: Option[String] = None
  ): DataFrame =
    df.withColumn("ingest_ts",
        ingestTs.map(t => to_timestamp(lit(t))).getOrElse(current_timestamp()))
      .withColumn("run_date", lit(runDate))
      .withColumn("source_file", input_file_name())
      .withColumn("source_system", lit(sourceSystem))

  /** Raw-value copy kept alongside each coerced numeric column so the
    * validation stage can REJECT cast failures instead of silently nulling
    * them (timestamps deliberately stay null-on-malformed — the reference's
    * imputable-missing semantics, SURVEY §7.4.5; a malformed counter is a
    * data error, not a missing value).
    */
  private def rawCopy(c: String) = s"__raw_$c"

  def coerceTypes(df: DataFrame, contract: TableContract): DataFrame = {
    val ts = contract.timestampCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, try_to_timestamp(col(c), lit(TsFormat)))
    }
    val bools = contract.booleanCols.foldLeft(ts) { (d, c) =>
      d.withColumn(c, Impute.parseBoolean(col(c)))
    }
    // Numeric coercion must be null-on-malformed (try_cast), never an ANSI
    // throw; the raw value is preserved for the not-numeric reject rule.
    contract.numericCols.foldLeft(bools) { case (d, (c, t)) =>
      d.withColumn(rawCopy(c), col(c))
        .withColumn(c, expr(s"try_cast($c AS $t)"))
    }
  }

  /** Reject rules for numeric cells that failed coercion (raw present,
    * coerced null).
    */
  def castFailureRules(contract: TableContract): Seq[Validation.Rule] =
    contract.numericCols.map { case (c, _) =>
      Validation.Rule(s"${c}_not_numeric",
        col(c).isNull && trim(col(rawCopy(c))) =!= "",
        Seq(c, rawCopy(c)))
    }

  /** Result of one bronze ingest. `tagged` is the CACHED parent of both
    * branches — callers must `unpersist()` it once valid/reject outputs are
    * materialized, or the block stays pinned for the session lifetime.
    */
  final case class BronzeResult(
      valid: DataFrame,
      rejects: DataFrame,
      summary: Validation.DqSummary,
      tagged: DataFrame
  ) {
    def unpersist(): Unit = tagged.unpersist()
  }

  /** Full bronze step: read → rename → coerce → metadata → validate-split.
    * The tagged frame is cached once so both branches and the summary share
    * one scan.
    */
  def ingest(
      spark: SparkSession,
      path: String,
      contract: TableContract,
      runDate: String,
      sourceSystem: String = "kaggle_meta",
      ingestTs: Option[String] = None
  ): BronzeResult = {
    val raw     = readCsv(spark, path, contract)
    val named   = rename(raw, contract)
    val typed   = coerceTypes(named, contract)
    val meta    = withMetadata(typed, runDate, sourceSystem, ingestTs)
    // Rules referencing post-explode columns (tags) don't apply at this
    // stage; cast-failure rules are appended after the contract rules so a
    // row violating both gets the contract reason.
    val applicable = (contract.rules ++ castFailureRules(contract))
      .filter(_.refs.forall(meta.columns.contains))
    val rawCopies = contract.numericCols.map { case (c, _) => rawCopy(c) }
    val tagged = Validation.tagged(meta, applicable).drop(rawCopies: _*).cache()
    val summary = Validation.summarize(contract.name, tagged)
    val valid   = tagged.filter(col("reject_reason").isNull).drop("reject_reason")
    val rejects = tagged.filter(col("reject_reason").isNotNull)
    BronzeResult(valid, rejects, summary, tagged)
  }
}
