package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for float-vector dot products.
  *
  * The composable alternative — `aggregate(zip_with(a,b,_*_),0d,_+_)` —
  * allocates an intermediate array per row and walks higher-order-function
  * lambdas; this expression runs a tight primitive loop over the two
  * `ArrayData` buffers and participates in whole-stage codegen. Use it on
  * the 100 TB hot path (similarity scoring over billions of vectors) where
  * per-row allocation is the dominant cost; use the quantized-integer path
  * (CosineTopK) when cross-engine hash-stability matters more than speed.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_dot expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n  = math.min(xa.numElements(), xb.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += xa.getFloat(i).toDouble * xb.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** Exact integer dot product of two quantized (array<long>) vectors —
  * the scoring primitive of every cosine operator. Value-identical to
  * `aggregate(zip_with(a,b,_*_),0L,_+_)` for equal-length null-free arrays
  * (the only shape the similarity operators produce): integer addition is
  * exact and order-free, so the loop sum equals the fold sum bit-for-bit.
  * Mismatched lengths or null elements → null, matching the composed
  * form's null-poisoning. One tight loop, no zipped intermediate array.
  */
case class LongVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    LongVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Long $boxed = graft.functions.LongVecDot.dot($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongVecDot =
    copy(left = l, right = r)
}

object LongVecDot {
  /** Boxed return: null signals the composed form's null-poisoning cases. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** Sign-random-hyperplane LSH bucket over a quantized vector — native
  * one-pass form of `CosineTopK.signLshBucket`'s composed expression
  * (which ran nBits aggregate+zip_with passes per row). Same hyperplane
  * hash, bit-identical buckets.
  */
case class SignLshBucketNative(child: Expression, nBits: Int, stride: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any): Any =
    SignLshBucketNative.bucket(a.asInstanceOf[ArrayData], nBits, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshBucketNative.bucket($c, $nBits, ${stride}L)")

  override protected def withNewChildInternal(c: Expression): SignLshBucketNative =
    copy(child = c)
}

object SignLshBucketNative {
  def bucket(qv: ArrayData, nBits: Int, stride: Long): Long = {
    val n   = qv.numElements()
    var sig = 0L
    var j   = 0
    while (j < nBits) {
      var proj = 0L
      var i    = 0
      while (i < n) {
        // i is 1-based in the composed form's sequence(1, size)
        val h = (((stride * j + (i + 1)) * 2654435761L) % 4294967296L) >> 16
        val sign = if ((h & 1L) == 1L) 1L else -1L
        proj += qv.getLong(i) * sign
        i += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** float/double vector → exact integer vector on a 1/scale grid — native
  * one-pass form of `transform(vec, x => round(x.cast("double") * scale)
  * .cast("long"))`. The composed form's lambda is CodegenFallback, which
  * evicted every kernel-bearing projection in the cosine/ANN family from
  * whole-stage codegen (the round-6 watchdog caught LongVecDot running
  * interpreted in all of them — same lesson as WordNgramsNative:
  * the lambda must not share a node with the hot kernels).
  *
  * Bit-identical to the composed form: same double widening, same
  * HALF_UP rounding via BigDecimal.valueOf (Spark's Round on doubles),
  * same truncating cast; null elements stay null. Non-finite inputs throw
  * like the ANSI double→long cast would — quantization is defined on
  * finite embeddings only.
  */
case class QuantizeNative(child: Expression, scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(org.apache.spark.sql.types.LongType, n)
    case _               => ArrayType(org.apache.spark.sql.types.LongType)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize expects array<float>/array<double>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    QuantizeNative.quantize(a.asInstanceOf[ArrayData], scale, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QuantizeNative.quantize($c, ${scale}L, $isFloat)")

  override protected def withNewChildInternal(c: Expression): QuantizeNative =
    copy(child = c)
}

object QuantizeNative {
  def quantize(a: ArrayData, scale: Long, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) *
          scale.toDouble
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          throw new ArithmeticException(
            s"quantize: non-finite value $d cannot cast to BIGINT")
        // Spark's Round(double): BigDecimal.valueOf + HALF_UP — exact twin
        val r = java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        // ANSI double→long overflow check, Spark's own LongExactNumeric
        // condition verbatim (floor/ceil compared against the long bounds
        // promoted to double) — a finite out-of-range value THROWS like
        // the cast the doc promises, instead of toLong's silent saturation
        if (!(Math.floor(r) <= Long.MaxValue.toDouble &&
            Math.ceil(r) >= Long.MinValue.toDouble))
          throw new ArithmeticException(
            s"quantize: value $r out of BIGINT range")
        out(i) = java.lang.Long.valueOf(r.toLong)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {

  /** Column-level API for the native dot product. */
  def float_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native quantizer (round(x*scale) per element, exact twin of the
    * composed transform).
    */
  def quantize_native(vec: Column, scale: Long): Column =
    ColumnBridge.column(QuantizeNative(ColumnBridge.expression(vec), scale))

  /** Native exact integer dot of quantized vectors. */
  def long_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native sign-hyperplane LSH bucket. */
  def sign_lsh_bucket(qv: Column, nBits: Int, stride: Long): Column =
    ColumnBridge.column(
      SignLshBucketNative(ColumnBridge.expression(qv), nBits, stride))

  /** Native float cosine: dot / (||a||·||b||). NaN-free for zero vectors is
    * the caller's concern (norm 0 → NaN, filter upstream).
    */
  def float_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    float_dot(a, b) / (sqrt(float_dot(a, a)) * sqrt(float_dot(b, b)))
  }
}
