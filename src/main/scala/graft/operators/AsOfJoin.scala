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
  * window pass carrying the last right PAYLOAD STRUCT forward in (ts, tag)
  * order, keep left rows. The payload travels as ONE struct — carrying
  * columns independently with ignoreNulls would stitch values from
  * different right rows whenever one attached column is null.
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
    * @param rightVals right columns to attach, as (input name → output name)
    * @param rightTiebreak ordering among right rows sharing a ts (all
    *                  columns used, ascending; LAST under this order wins);
    *                  keeps output deterministic when right timestamps tie
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
    val ts      = "__asof_ts"
    val tag     = "__asof_tag"
    val payload = "__asof_payload"
    val tbCols  = rightTiebreak.zipWithIndex.map { case (_, i) => s"__asof_tb_$i" }

    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(tag, lit(1))

    // A right row with a null timestamp can never be "the greatest ts ≤
    // left ts" — drop it (it would otherwise sort first and leak its
    // payload into unmatched left rows).
    val r = right.filter(col(rightTs).isNotNull).select(
      (keys.map(col) :+ col(rightTs).as(ts)) ++
        rightTiebreak.zip(tbCols).map { case (in, out) => col(in).as(out) } :+
        struct(rightVals.map { case (in, out) => col(in).as(out) }: _*).as(payload): _*)
      .withColumn(tag, lit(0))

    // align schemas: left gets a null payload + null tiebreaks; right gets
    // null left columns
    val lAligned = tbCols.foldLeft(
      l.withColumn(payload, lit(null).cast(r.schema(payload).dataType))
    ) { (df, c) => df.withColumn(c, lit(null).cast(r.schema(c).dataType)) }
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }

    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.map(col): _*))
    // Right rows sort BEFORE left rows at equal ts (tag 0 < 1) → the as-of
    // match is inclusive; tiebreaks order right rows sharing a ts so the
    // LAST one deterministically wins.
    val ordering = col(ts).asc +: col(tag).asc +: tbCols.map(col(_).asc_nulls_first)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(
      payload, last(col(payload), ignoreNulls = true).over(w))
    rightVals.foldLeft(carried.filter(col(tag) === 1)) { case (df, (_, out)) =>
      df.withColumn(out, col(s"$payload.$out"))
    }.select((leftCols ++ rightVals.map(_._2)).map(col): _*)
  }
}
