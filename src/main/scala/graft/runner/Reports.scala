package graft.runner

import java.nio.file.{Files, Paths}

import graft.bronze.Validation.DqSummary

/** Driver-side JSON run reports — the reference's `_reports` JSON side
  * channel (Meta_Guideline.md:998-1023, 1456-1512): per-table bronze
  * summaries merged into an overall report with the global rejection rate.
  * Only scalars cross the driver boundary; all heavy computation stays in
  * Spark.
  */
object Reports {

  private def esc(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  def toJson(v: Any): String = v match {
    case null          => "null"
    case s: String     => "\"" + esc(s) + "\""
    case b: Boolean    => b.toString
    case n: Int        => n.toString
    case n: Long       => n.toString
    case n: Double     => if (n.isNaN || n.isInfinite) "null" else n.toString
    case m: Map[_, _]  =>
      m.map { case (k, x) => "\"" + esc(k.toString) + "\":" + toJson(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_]    => xs.map(toJson).mkString("[", ",", "]")
    case other         => "\"" + esc(other.toString) + "\""
  }

  def bronzeSummary(runDate: String, summaries: Seq[DqSummary]): Map[String, Any] = {
    val input    = summaries.map(_.input).sum
    val rejected = summaries.map(_.rejected).sum
    Map(
      "run_date"               -> runDate,
      "tables"                 -> summaries.map(s => Map(
        "table"          -> s.table,
        "input_rows"     -> s.input,
        "valid_rows"     -> s.valid,
        "rejected_rows"  -> s.rejected,
        "rejection_rate" -> s.rejectionRate)),
      "total_input_rows"       -> input,
      "total_rejected_rows"    -> rejected,
      "overall_rejection_rate" -> (if (input == 0) 0.0 else rejected.toDouble / input)
    )
  }

  def writeJson(path: String, report: Map[String, Any]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, toJson(report))
  }
}
