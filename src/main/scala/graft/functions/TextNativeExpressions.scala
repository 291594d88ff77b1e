package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot paths.
  *
  * Each is VALUE-IDENTICAL to the composed higher-order-function
  * formulation in `TextFunctions`/`NearDup` (the DuckDB oracles are
  * unchanged and still pass), but runs a tight primitive loop instead of
  * materializing intermediate arrays per row:
  *
  *  - `rolling_hash_native`: the composed form builds an Int array of
  *    length(text) (sequence + transform + ascii-per-substr) and folds it;
  *    this walks the string's code points once.
  *  - `simhash_native`: the composed form makes 32 passes over the hashed
  *    token array (one aggregate per bit); this keeps 32 counters in one
  *    pass.
  *  - `minhash_sig_native`: the composed form runs k=16
  *    transform+array_min passes (each allocating an array); this keeps 16
  *    running minima in one pass.
  *
  * All three implement `doGenCode` (generated code calls the same static
  * helpers as the interpreted path), so surrounding projections stay in
  * whole-stage codegen.
  */
object TextNative {

  val Mod: Long = 1000000007L

  def rollingHash(s: UTF8String): Long = {
    if (s == null) return 0L
    val str = s.toString
    if (str.isEmpty) return 0L
    var acc = 0L
    var i   = 0
    val n   = str.length
    while (i < n) {
      // codePointAt matches Spark's ascii(substr(i,1)) = first code point
      // of each character position; surrogate pairs: the composed form
      // walks CHARACTER positions via substr, which splits on code points
      // in Spark's UTF8String — our corpora are BMP text, identical there.
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def simhash32(hv: ArrayData): Long = {
    val n     = hv.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j   = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** One pass over the (hashed, non-null) shingle array computing all k
    * universal-hash minima. Empty input → array of P (matches
    * `array_min(transform([]))` = null? No — the composed form yields null
    * mins for empty arrays; callers only invoke this on non-empty shingle
    * sets (empty docs produce no signature bands). To stay value-identical
    * we return nulls for empty input.
    */
  def minhashSig(hv: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val n = hv.numElements()
    val k = as.length
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

case class RollingHashNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    TextNative.rollingHash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHashNative = copy(child = c)
}

case class Simhash32Native(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    TextNative.simhash32(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.simhash32($c)")
  override protected def withNewChildInternal(c: Expression): Simhash32Native = copy(child = c)
}

case class MinHashSigNative(left: Expression, right: Expression,
    as: Seq[Long], bs: Seq[Long], p: Long) extends BinaryExpression {
  // right is unused (lit(0)); BinaryExpression chosen over UnaryExpression +
  // constructor Seqs alone so the params participate in equality/treeHash
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray
  override def nullSafeEval(a: Any, b: Any): Any =
    TextNative.minhashSig(a.asInstanceOf[ArrayData], aArr, bArr, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.TextNative.minhashSig($a, $aRef, $bRef, ${p}L);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSigNative =
    copy(left = l, right = r)
}

object TextNativeExpressions {
  import org.apache.spark.sql.functions.lit

  def rolling_hash_native(c: Column): Column =
    ColumnBridge.column(RollingHashNative(ColumnBridge.expression(c)))

  def simhash_native(hashedTokens: Column): Column =
    ColumnBridge.column(Simhash32Native(ColumnBridge.expression(hashedTokens)))

  def minhash_sig_native(hashedShingles: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSigNative(
      ColumnBridge.expression(hashedShingles), ColumnBridge.expression(lit(0)), as, bs, p))
}
