package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  ArrayIntersect, BinaryExpression, Expression, Size
}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` for long arrays WITHOUT materializing the intersection.
  *
  * `size(array_intersect(a, b))` — the natural composed form — allocates an
  * intermediate ArrayData per row through the generic (boxed,
  * null-tolerant) set path, only to take its length. For the near-dup
  * operators this runs once per candidate pair, i.e. hundreds of millions
  * of times at corpus scale; profiling the Jaccard stage showed it
  * dominating. This expression copies both arrays into primitive long[],
  * sorts, and merge-counts distinct common elements — no boxing, no
  * intermediate array, cache-linear.
  *
  * Same semantics as the composed form for non-null long arrays (distinct
  * common element count); null elements are ignored (our shingle arrays
  * never contain them — guarded by the rewrite rule only firing on
  * `containsNull=false` arrays).
  */
case class IntersectCount(left: Expression, right: Expression,
    assumeSorted: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], assumeSorted)

  /** Whole-stage codegen: the hottest expression in the near-dup stage must
    * not drop the surrounding pipeline out of codegen (CodegenFallback
    * forces boxed InternalRow evaluation for the whole projection). The
    * generated code calls the same static merge the interpreted path uses —
    * one tight primitive loop, no per-row allocation beyond the long[]
    * copies.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCount.merge($a, $b, $assumeSorted);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCount =
    copy(left = l, right = r)
}

object IntersectCount {
  /** Distinct-common-element count of two long arrays; static so generated
    * Java and the interpreted path share one implementation (the Scala
    * companion emits a static forwarder on the class).
    */
  def merge(a: ArrayData, b: ArrayData, assumeSorted: Boolean): Int = {
    val xa = a.toLongArray()
    val xb = b.toLongArray()
    // When the producer pre-sorts (NearDup sorts each shingle set ONCE),
    // skip the per-pair sort: a document participating in k candidate
    // pairs would otherwise be re-sorted k times.
    if (!assumeSorted) {
      java.util.Arrays.sort(xa)
      java.util.Arrays.sort(xb)
    }
    var i = 0; var j = 0; var n = 0
    var last = 0L; var hasLast = false
    while (i < xa.length && j < xb.length) {
      val va = xa(i); val vb = xb(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        if (!hasLast || va != last) { n += 1; last = va; hasLast = true }
        i += 1; j += 1
      }
    }
    n
  }
}

/** Optimizer rule: rewrite `size(array_intersect(a, b))` to IntersectCount
  * when both sides are non-null long arrays. Purely a physical-cost
  * rewrite — values are identical, so oracle comparisons are unaffected.
  */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _                          => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // legacySizeOfNull=false only: the legacy mode returns -1 for null
    // inputs, which IntersectCount (NULL) would silently change.
    case Size(ArrayIntersect(a, b), false) if isLongArray(a) && isLongArray(b) =>
      IntersectCount(a, b)
  }
}

/** Session extension wiring (`GraftSession` installs this). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteIntersectSize)
}

object GraftExtensions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Direct column API for IntersectCount (library hot paths call this;
    * the optimizer rule covers composed user queries). Precondition:
    * null-free long arrays; set `assumeSorted` ONLY when the producer
    * guarantees ascending order (e.g. via array_sort).
    */
  def intersect_count(a: Column, b: Column, assumeSorted: Boolean = false): Column =
    ColumnBridge.column(
      IntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b), assumeSorted))
}
