package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (DuckDB/Pandas
  * `ASOF JOIN`): for each left row, attach the right row with the greatest
  * right-ts ≤ left-ts within the same key.
  *
  * Implementation is COMPOSED from built-ins (preference (a) from the build
  * rules — no custom SparkStrategy needed): tag both sides, union, one
  * window pass carrying the last non-null right values forward in (ts, tag)
  * order, keep left rows.
  *
  * Scale shape: ONE shuffle on the key (the window partition) and a linear
  * scan — no pairwise join blow-up, no range-condition nested loop. This is
  * the same partition-and-scan plan a native as-of SparkPlan would produce;
  * at 100 TB the cost is a sort-within-partitions of left+right, exactly the
  * lower bound for the operator.
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param keys      equi-key columns present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightVals right columns to attach (renamed as given)
    * @param rightTiebreak extra ordering among right rows sharing a ts
    *                  (latest wins); keeps output deterministic
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[(String, String)],
      rightTiebreak: Seq[String] = Nil
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val ts       = "__asof_ts"
    val tag      = "__asof_tag"

    val l = rightVals.foldLeft(
      left.withColumn(ts, col(leftTs)).withColumn(tag, lit(1))
    ) { case (df, (_, out)) => df.withColumn(out, lit(null)) }
      .withColumn("__tb", lit(null).cast("long"))

    val rTb = rightTiebreak.headOption.map(col(_).cast("long")).getOrElse(lit(0L))
    val r = leftCols.foldLeft(
      right
        .select((keys.map(col) :+ col(rightTs).as(ts)) ++
          rightVals.map { case (in, out) => col(in).as(out) }: _*)
        .withColumn(tag, lit(0))
        .withColumn("__tb", rTb)
    ) { case (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }

    val unioned = l.unionByName(r.select(l.columns.map(col): _*))
    // Right rows sort BEFORE left rows at equal ts (tag 0 < 1) → the as-of
    // match is inclusive (right at ts == left ts is visible).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried
      .filter(col(tag) === 1)
      .select((leftCols ++ rightVals.map(_._2)).map(col): _*)
  }
}
