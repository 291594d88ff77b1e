package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Dense-set kernels for the near-dup similarity joins (round-16
  * optimization).
  *
  * When a shingle corpus has a SMALL global vocabulary (the dense regime —
  * e.g. short fixed-alphabet strings, k-mer corpora, templated text), the
  * sparse posting-list machinery of the AllPairs/PPJoin candidate stage is
  * asymptotically WORSE than direct pairwise comparison: with N docs of
  * ~s tokens over a vocabulary of V distinct tokens, the prefix-posting
  * join materializes Σ_t df_probe(t)·df_index(t) ≈ N²·s²/V rows, versus
  * N² direct pairs — a factor s²/V ≥ 1 blow-up whenever V ≤ s² (measured
  * 680 executor-CPU-seconds on the sf0.1 documents corpus, V ≈ 500,
  * s ≈ 250: ~125× more join rows than doc pairs).
  *
  * In that regime each document's shingle SET is represented as a V-bit
  * bitmap (ceil(V/64) longs) and |A∩B| is a word-wise AND + popcount —
  * ~V/64 fused ops per pair instead of an O(s) sorted merge over two
  * 8·s-byte arrays. Both expressions are codegen'd (no CodegenFallback —
  * an interpreted kernel here would evict the whole pair pipeline from
  * whole-stage codegen, the round-6 watchdog lesson).
  *
  * Exactness: the bitmap is a lossless re-encoding of the distinct shingle
  * set against a fixed global vocabulary, so intersection counts (and
  * therefore Jaccard values) are bit-identical to the sorted-merge path.
  */
object DenseSetExpressions {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def bitset_from_sorted(c: Column, vocabSorted: Array[Long]): Column =
    ColumnBridge.column(BitsetFromSorted(ColumnBridge.expression(c), vocabSorted))

  def bitset_and_count(a: Column, b: Column): Column =
    ColumnBridge.column(BitsetAndCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Static helpers shared by interpreted eval and generated code. */
  def buildBitmap(sortedShingles: ArrayData, vocabSorted: Array[Long]): ArrayData = {
    val words = new Array[Long]((vocabSorted.length + 63) >>> 6)
    val n = sortedShingles.numElements()
    var i = 0 // cursor in the doc's sorted shingle array
    var j = 0 // cursor in the sorted vocabulary
    while (i < n && j < vocabSorted.length) {
      val s = sortedShingles.getLong(i)
      val v = vocabSorted(j)
      if (s == v) { words(j >>> 6) |= (1L << (j & 63)); i += 1; j += 1 }
      else if (s < v) i += 1 // shingle not in vocab (caller guarantees ⊆; tolerate)
      else j += 1
    }
    new GenericArrayData(words)
  }

  def andCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    c
  }
}

/** SORTED long-array shingle set → V-bit bitmap against a fixed sorted
  * vocabulary (carried as a codegen reference object, like the BPE merge
  * tables). One linear merge per document — O(s + V).
  */
case class BitsetFromSorted(child: Expression, vocabSorted: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DenseSetExpressions.buildBitmap(input.asInstanceOf[ArrayData], vocabSorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocabSorted", vocabSorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DenseSetExpressions.buildBitmap($c, $vocabRef);")
  }

  override protected def withNewChildInternal(c: Expression): BitsetFromSorted =
    copy(child = c)
}

/** popcount(a AND b) over two equal-width long bitmaps — the dense-regime
  * |A∩B|. Output type matches IntersectCount (int).
  */
case class BitsetAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    DenseSetExpressions.andCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DenseSetExpressions.andCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitsetAndCount =
    copy(left = l, right = r)
}
