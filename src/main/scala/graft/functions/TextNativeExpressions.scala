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

  def simhash32(hv: ArrayData): Long = simhash(hv, 32)

  /** Width-parameterized SimHash (bits ≤ 63 so the signature is a plain
    * nonnegative long): bit j is 1 iff more token hashes have bit j set
    * than clear. 32-bit signatures serve ≲10⁹ docs; wider signatures keep
    * equal-chunk buckets small at larger corpora (SCALING.md).
    */
  def simhash(hv: ArrayData, bits: Int): Long = {
    val n     = hv.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j   = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.hash.Murmur3_x86_32

  private def tokenHash64(s: UTF8String): Long = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 41)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 43)
    (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
  }

  /** null for < 2 tokens; otherwise struct(top_bigram_count, n_bigrams). */
  def repetitionStats(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n < 2) return null
    val m = n - 1 // bigram count
    // open-addressed long→count table, power-of-two ≥ 2m
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val keys   = new Array[Long](cap)
    val counts = new Array[Int](cap)
    val mask   = cap - 1
    var top    = 0
    var prev   = tokenHash64(toks.getUTF8String(0))
    var i      = 1
    while (i < n) {
      val cur = tokenHash64(toks.getUTF8String(i))
      // 64-bit pair mix; 0 is reserved as the empty slot marker
      var k = prev * 0xBF58476D1CE4E5B9L + cur * 0x94D049BB133111EBL
      if (k == 0L) k = 1L
      var slot = (k ^ (k >>> 32)).toInt & mask
      var done = false
      while (!done) {
        if (counts(slot) == 0) {
          keys(slot) = k; counts(slot) = 1
          if (top < 1) top = 1
          done = true
        } else if (keys(slot) == k) {
          counts(slot) += 1
          if (counts(slot) > top) top = counts(slot)
          done = true
        } else slot = (slot + 1) & mask
      }
      prev = cur
      i += 1
    }
    new GenericInternalRow(Array[Any](top.toLong, m.toLong))
  }

  /** Distinct word n-grams of a text in ONE pass: tokenize (same
    * whitespace class + empty-filter as `TextFunctions.tokens`, which is
    * why tokenization lives INSIDE the kernel — a `filter` lambda is
    * CodegenFallback and evicts the whole projection from WSCG), then
    * space-joined n-grams deduped in first-occurrence order (matching
    * `array_distinct` over the composed form exactly — spec-asserted).
    */
  /** Shared empty result (immutable); also referenced from generated code
    * via the object's static forwarder.
    */
  val EmptyStringArray: ArrayData = new GenericArrayData(Array.empty[Any])

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** md5-prefix token hashes, fused tokenize + hash (see
    * [[TokenHashesNative]]). Hash = first `hexLen` lowercase-hex chars of
    * md5(token-utf8) parsed base 16 — nibble-exact twin of
    * `conv(substring(md5(t), 1, hexLen), 16, 10)`.
    */
  def tokenMd5Hashes(s: UTF8String, hexLen: Int): ArrayData = {
    val str = s.toString
    val md  = md5Local.get()
    val out = new java.util.ArrayList[Any]()
    val sb  = new java.lang.StringBuilder
    def flush(): Unit = if (sb.length > 0) {
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var k = 0
      while (k < hexLen) {
        val b = digest(k >> 1) & 0xff
        val nibble = if ((k & 1) == 0) b >> 4 else b & 0xf
        v = (v << 4) | nibble
        k += 1
      }
      out.add(java.lang.Long.valueOf(v))
      sb.setLength(0)
    }
    var i   = 0
    val len = str.length
    while (i < len) {
      val c = str.charAt(i)
      // the explicit class [ \t\n\x0B\f\r] — Java \s ≠ RE2 \s, so the
      // engine never uses \s anywhere (oracle-stability rules)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r')
        flush()
      else sb.append(c)
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  /** Whitespace tokens (same explicit class + empty-filter as
    * `TextFunctions.tokens`) as an ArrayData of UTF8String — the fused
    * tokenizer shared by [[TokensNative]].
    */
  def tokenize(s: UTF8String): ArrayData = {
    val str  = s.toString
    val out  = new java.util.ArrayList[Any]()
    val sb   = new java.lang.StringBuilder
    var i    = 0
    val len  = str.length
    while (i < len) {
      val c = str.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) { out.add(UTF8String.fromString(sb.toString)); sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }


  /** Lowercase char n-gram shingle set, hashed, DISTINCT, SORTED ascending —
    * fused twin of `TextFunctions.hashedShingles` (md5-prefix-12, portable)
    * and `hashedShinglesFast` (xxhash64 & 2^48−1): UTF8String.toLowerCase
    * is exactly Spark's `lower`, windows advance by CODE POINTS exactly
    * like `substr`, and hashing runs over the same UTF-8 bytes the
    * composed form's substring would carry. Text shorter than n (and NULL
    * text, via the composed form's null-condition → otherwise branch) →
    * empty array.
    */
  def charShingleHashes(s: UTF8String, n: Int, fast: Boolean): ArrayData = {
    if (s == null) return EmptyLongArray
    val lc    = s.toLowerCase
    val bytes = lc.getBytes
    // code-point start offsets (valid UTF-8: starts are non-continuation bytes)
    var chars = 0
    var i     = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    val m = chars - n + 1
    if (m <= 0) return EmptyLongArray
    val offs = new Array[Int](chars + 1)
    var ci = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(ci) = i; ci += 1 }
      i += 1
    }
    offs(chars) = bytes.length
    val hs = new Array[Long](m)
    val md = if (fast) null else md5Local.get()
    var j  = 0
    while (j < m) {
      val off = offs(j)
      val len = offs(j + n) - off
      hs(j) =
        if (fast)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
            len, 42L) & 0xFFFFFFFFFFFFL
        else {
          md.reset()
          md.update(bytes, off, len)
          val digest = md.digest()
          // first 12 hex chars = first 6 bytes, parsed base 16
          var v = 0L
          var k = 0
          while (k < 6) { v = (v << 8) | (digest(k) & 0xffL); k += 1 }
          v
        }
      j += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    j = 0
    while (j < m) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(w) = hs(j); w += 1 }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(hs, w))
  }

  val EmptyLongArray: ArrayData = new GenericArrayData(Array.empty[Any])

  def wordNgramsDistinct(s: UTF8String, n: Int): ArrayData = {
    val str  = s.toString
    val toks = new java.util.ArrayList[String]()
    val sb   = new java.lang.StringBuilder
    var i    = 0
    val len  = str.length
    while (i < len) {
      val c = str.charAt(i)
      // the explicit class [ \t\n\x0B\f\r] — Java \s ≠ RE2 \s, so the
      // engine never uses \s anywhere (oracle-stability rules)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) toks.add(sb.toString)
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j < m) {
      val b = new java.lang.StringBuilder(toks.get(j))
      var k = 1
      while (k < n) { b.append(' '); b.append(toks.get(j + k)); k += 1 }
      seen.add(b.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it  = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  /** All word n-grams WITH multiplicity (no dedup) — the instance stream
    * LM scoring consumes (every bigram occurrence contributes its
    * conditional probability once). Same fused tokenize pass as
    * [[wordNgramsDistinct]].
    */
  def wordNgramsAll(s: UTF8String, n: Int): ArrayData = {
    val str  = s.toString
    val toks = new java.util.ArrayList[String]()
    val sb   = new java.lang.StringBuilder
    var i    = 0
    val len  = str.length
    while (i < len) {
      val c = str.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) toks.add(sb.toString)
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val b = new java.lang.StringBuilder(toks.get(j))
      var k = 1
      while (k < n) { b.append(' '); b.append(toks.get(j + k)); k += 1 }
      out(j) = UTF8String.fromString(b.toString)
      j += 1
    }
    new GenericArrayData(out)
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

/** Per-document token-bigram statistics in ONE pass, zero shuffles: the
  * composed formulation exploded every bigram (corpus×avg-len rows through
  * two exchanges) to count values that never leave their row. Returns
  * struct(top_bigram_count, n_bigrams), null for < 2 tokens (nothing to
  * score — such docs are absent from the operator's output either way).
  *
  * Counting keys are 64-bit token hashes (two murmur32 seeds combined)
  * mixed per pair — distinct bigrams collide with probability ~n²/2⁶⁴ per
  * document, i.e. never in practice; the DuckDB oracle counts the actual
  * strings and agrees.
  */
case class RepetitionStatsNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    new org.apache.spark.sql.types.StructType()
      .add("top_bigram_count", LongType, nullable = false)
      .add("n_bigrams", LongType, nullable = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TextNative.repetitionStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("repRow")
      s"""
         |InternalRow $r = graft.functions.TextNative.repetitionStats($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RepetitionStatsNative =
    copy(child = c)
}

case class RollingHashNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    TextNative.rollingHash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHashNative = copy(child = c)
}

/** text → distinct word n-grams, tokenization fused into the kernel (see
  * `TextNative.wordNgramsDistinct`). Value-identical to
  * `array_distinct(transform(sequence(...), i => array_join(slice(tokens(
  * text), i, n), " ")))` — the composed form is three CodegenFallback
  * lambdas that evict their projection from WSCG and run interpreted.
  */
case class WordNgramsNative(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  // NULL text → EMPTY array, matching the composed form exactly:
  // size(null) is null (non-legacy), so its when() falls to the
  // otherwise(empty) branch — never-null output, like array_distinct's
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextNative.EmptyStringArray
    else TextNative.wordNgramsDistinct(v.asInstanceOf[UTF8String], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        ArrayData ${ev.value} = ${childGen.isNull}
          ? graft.functions.TextNative.EmptyStringArray()
          : graft.functions.TextNative.wordNgramsDistinct(${childGen.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordNgramsNative = copy(child = c)
}

/** text → ALL word n-grams with multiplicity (the LM-scoring instance
  * stream), tokenization fused like [[WordNgramsNative]]. NULL text →
  * empty array (never-null output).
  */
case class WordNgramsAllNative(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams_all: n must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextNative.EmptyStringArray
    else TextNative.wordNgramsAll(v.asInstanceOf[UTF8String], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        ArrayData ${ev.value} = ${childGen.isNull}
          ? graft.functions.TextNative.EmptyStringArray()
          : graft.functions.TextNative.wordNgramsAll(${childGen.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordNgramsAllNative = copy(child = c)
}

case class SimhashNative(child: Expression, bits: Int = 32) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    TextNative.simhash(a.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.simhash($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SimhashNative = copy(child = c)
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

/** text → md5-prefix hashes of its whitespace tokens in ONE pass —
  * native twin of `transform(tokens(text), t => conv(substring(md5(t), 1,
  * hexLen), 16, 10).cast("long"))`. Both the `filter` inside `tokens()`
  * and the outer `transform` are CodegenFallback lambdas, and either one
  * evicts the whole projection (the round-6 watchdog caught SimhashNative
  * running interpreted in every simhash query because of exactly this
  * pair). Tokenization uses the same explicit whitespace class as
  * `TextFunctions.tokens`; the hash is the same lowercase-hex md5 prefix
  * parsed base-16, so values are bit-identical and the DuckDB oracles are
  * untouched. NULL text → NULL (the composed transform's null
  * propagation); empty text → empty array.
  */
/** text → whitespace tokens, fused (see `TextNative.tokenize`) — the
  * composed `filter(split(...), length > 0)` carries a CodegenFallback
  * lambda that evicts any projection it shares with a kernel. NULL → NULL
  * like `split`.
  */
case class TokensNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextNative.tokenize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.tokenize($c)")
  override protected def withNewChildInternal(c: Expression): TokensNative =
    copy(child = c)
}

/** text → sorted distinct hashed char-shingle set, fused (see
  * `TextNative.charShingleHashes`). NULL text → EMPTY array, matching the
  * composed `when(length(lc) >= n, ...).otherwise(empty)` whose null
  * condition falls to the otherwise branch — hence the WordNgramsNative-
  * style never-null eval override.
  */
case class CharShingleHashesNative(child: Expression, n: Int, fast: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"char_shingle_hashes: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    TextNative.charShingleHashes(v.asInstanceOf[UTF8String], n, fast)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        ArrayData ${ev.value} = graft.functions.TextNative.charShingleHashes(
          ${childGen.isNull} ? null : ${childGen.value}, $n, $fast);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): CharShingleHashesNative =
    copy(child = c)
}

case class TokenHashesNative(child: Expression, hexLen: Int)
    extends UnaryExpression {
  require(hexLen >= 1 && hexLen <= 15,
    s"token_md5_hashes: hexLen must be in [1, 15] (sign-safe BIGINT), got $hexLen")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextNative.tokenMd5Hashes(s.asInstanceOf[UTF8String], hexLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNative.tokenMd5Hashes($c, $hexLen)")
  override protected def withNewChildInternal(c: Expression): TokenHashesNative =
    copy(child = c)
}

object TextNativeExpressions {

  def repetition_stats(tokens: Column): Column =
    ColumnBridge.column(RepetitionStatsNative(ColumnBridge.expression(tokens)))

  def token_md5_hashes(text: Column, hexLen: Int): Column =
    ColumnBridge.column(TokenHashesNative(ColumnBridge.expression(text), hexLen))

  def tokens_native(text: Column): Column =
    ColumnBridge.column(TokensNative(ColumnBridge.expression(text)))

  def char_shingle_hashes(text: Column, n: Int, fast: Boolean): Column =
    ColumnBridge.column(
      CharShingleHashesNative(ColumnBridge.expression(text), n, fast))
  import org.apache.spark.sql.functions.lit

  def rolling_hash_native(c: Column): Column =
    ColumnBridge.column(RollingHashNative(ColumnBridge.expression(c)))

  def word_ngrams_native(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsNative(ColumnBridge.expression(text), n))

  def word_ngrams_all_native(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsAllNative(ColumnBridge.expression(text), n))

  def simhash_native(hashedTokens: Column, bits: Int = 32): Column =
    ColumnBridge.column(SimhashNative(ColumnBridge.expression(hashedTokens), bits))

  def minhash_sig_native(hashedShingles: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSigNative(
      ColumnBridge.expression(hashedShingles), ColumnBridge.expression(lit(0)), as, bs, p))
}
