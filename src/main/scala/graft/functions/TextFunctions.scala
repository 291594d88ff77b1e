package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis primitives for training-data pipelines: tokenization,
  * language-ID heuristics, quality scoring, fingerprinting, shingling,
  * portable hashing.
  *
  * Everything here is pure Catalyst expression composition — no UDFs — so
  * whole-stage codegen applies and the operators scale linearly across
  * executors. Hashes are md5-based (not Spark's Murmur `hash()`) so results
  * are portable across engines — the DuckDB oracle computes the identical
  * value with `('0x' || substr(md5(s),1,N))::BIGINT`.
  */
object TextFunctions {

  /** Explicit whitespace characters shared by every tokenizer: Java's `\s`
    * includes vertical tab but RE2's (DuckDB) does not — spelling the class
    * out keeps both engines identical on control characters. `WsChars` is
    * the bare class body for embedding in other classes (e.g. `[^…]` —
    * nesting the bracketed form would mean different things to Java and
    * RE2); `WsClass` is the ready-made positive class.
    */
  val WsChars = " \\t\\n\\x0B\\f\\r"
  val WsClass = s"[$WsChars]"

  /** Whitespace tokens, empties filtered (split+filter matches DuckDB's
    * `list_filter(string_split_regex(...))` exactly, including
    * leading/trailing-space behavior).
    */
  def tokens(c: Column): Column =
    filter(split(c, WsClass + "+"), t => length(t) > 0)

  // size over the NATIVE tokenizer: the composed tokens() carries a filter
  // lambda (CodegenFallback) that evicted every projection tokenCount
  // shared with a kernel (round-6 watchdog); same values — tokenize ≡
  // tokens is spec-pinned via the fused token-hash equality
  def tokenCount(c: Column): Column =
    size(TextNativeExpressions.tokens_native(c))

  /** Lowercase, strip everything but [a-z0-9 ] — canonical form for
    * fingerprinting.
    */
  def normalize(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9 ]", "")

  /** Document fingerprint: md5 of the normalized text. Collision-safe exact
    * dedup key at any scale (128-bit).
    */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** First 12 hex chars of md5 as a 48-bit non-negative Long — the portable
    * string hash used by MinHash/SimHash.
    */
  def hexHash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** 32-bit variant (8 hex chars). */
  def hexHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit variant (15 hex chars — the widest md5 prefix that stays a
    * nonnegative BIGINT in every engine; 16 chars can overflow the sign
    * bit in the DuckDB oracle).
    */
  def hexHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Character n-gram shingles (lowercased), distinct. Empty array for
    * texts shorter than n (Spark's `sequence(1,0)` would count DOWN, so the
    * guard is mandatory).
    */
  def charShingles(c: Column, n: Int): Column = {
    val lc = lower(c)
    when(
      length(lc) >= n,
      array_distinct(transform(sequence(lit(1), length(lc) - (n - 1)), i => lc.substr(i, lit(n))))
    ).otherwise(array().cast(ArrayType(StringType)))
  }

  /** Hashed shingle SET: md5-hash each n-gram to 48 bits, distinct, SORTED
    * ascending. Set operations (intersect/union for Jaccard) on fixed-width
    * longs are several times cheaper than on strings — this is the
    * representation the near-dup operators use on the hot path. Sorting
    * once here lets pairwise intersection run as a pure linear merge
    * (IntersectCount assumeSorted) instead of re-sorting per pair.
    * Distinct-after-hash so an (astronomically unlikely) collision merges
    * identically in every engine; sorting doesn't change set semantics, so
    * oracles are unaffected.
    */
  def hashedShingles(c: Column, n: Int): Column =
    // fused native kernel: the composed transform/array_sort lambdas are
    // CodegenFallback and evicted every shingle+signature projection from
    // whole-stage codegen (round-6 watchdog finding); value-identical —
    // spec-asserted against the composed reference below
    TextNativeExpressions.char_shingle_hashes(c, n, fast = false)

  /** Composed formulation, equality reference for the native kernel. */
  def hashedShinglesComposed(c: Column, n: Int): Column = {
    val lc = lower(c)
    when(
      length(lc) >= n,
      array_sort(array_distinct(transform(sequence(lit(1), length(lc) - (n - 1)),
        i => hexHash48(lc.substr(i, lit(n))))))
    ).otherwise(array().cast(ArrayType(org.apache.spark.sql.types.LongType)))
  }

  /** FAST (non-portable) hashed shingle set: xxhash64 truncated to the same
    * non-negative 48-bit domain as `hashedShingles`, sorted, distinct.
    * xxhash64 is a codegen'd native expression — several times cheaper than
    * md5-over-hex on the shingling hot path. Use for PRODUCTION near-dup
    * runs; use `hashedShingles` when cross-engine verification matters
    * (DuckDB has no xxhash64). The exact-Jaccard verification stage is
    * hash-agnostic, so PRECISION is 1.0 in both modes and confirmed pairs
    * carry identical Jaccard values; only borderline candidate RECALL can
    * differ (LSH banding is probabilistic w.r.t. the hash family).
    */
  def hashedShinglesFast(c: Column, n: Int): Column =
    TextNativeExpressions.char_shingle_hashes(c, n, fast = true)

  /** Composed formulation, equality reference for the native kernel. */
  def hashedShinglesFastComposed(c: Column, n: Int): Column = {
    val lc = lower(c)
    when(
      length(lc) >= n,
      array_sort(array_distinct(transform(sequence(lit(1), length(lc) - (n - 1)),
        i => xxhash64(lc.substr(i, lit(n))).bitwiseAND(lit((1L << 48) - 1)))))
    ).otherwise(array().cast(ArrayType(org.apache.spark.sql.types.LongType)))
  }

  /** Language marker sets for the n-gram/stopword language-ID heuristic.
    * Order matters: ties resolve to the earlier entry.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "una", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "dans")
  )

  /** Count of tokens that appear in `markers`. */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  /** Predicted language: argmax of marker scores, first-listed wins ties,
    * "und" (undetermined) when all scores are 0.
    */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => (l, markerScore(toks, ms)) }
    val best   = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = scores.foldLeft(when(best === 0, "und")) { case (acc, (l, sc)) =>
      acc.when(sc === best, lit(l))
    }
    chain.otherwise(lit("und"))
  }

  /** BPE-ish subword tokenization: letter runs, digit runs, and single
    * punctuation marks — the regex shape of a byte-pair-encoder's
    * pre-tokenizer (GPT-2 style `\p{L}+|\p{N}+|[^\s\p{L}\p{N}]`).
    */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(s"[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"), lit(0))

  /** Polynomial rolling hash over the character stream:
    * fold(acc*31 + codepoint) mod 1e9+7. Portable: DuckDB computes the same
    * value with `list_reduce(list_prepend(0, codes), ...)`. Runs as the
    * native single-pass expression (the composed fold materialized an
    * Int array of length(text) per row); the `when` wrapper preserves the
    * composed form's null→0 behavior exactly.
    */
  def rollingHash(c: Column): Column =
    when(length(c) > 0, TextNativeExpressions.rolling_hash_native(c)).otherwise(0L)

  /** Composed (pure-builtin) formulation, kept as the equality reference
    * for the native expression's spec.
    */
  def rollingHashComposed(c: Column): Column =
    when(length(c) > 0,
      aggregate(
        transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
        lit(0L),
        (acc, x) => (acc * 31 + x) % 1000000007L
      )
    ).otherwise(0L)

  /** SimHash over a pre-hashed token array (use `hexHash32`/`hexHash60`
    * per token first so md5 is computed once, not once per bit). Bit j of
    * the signature is 1 iff more tokens have bit j set than clear
    * (ties → 0). Native one-pass expression — the composed form scans the
    * array once per bit.
    */
  def simhash(hashedTokens: Column, bits: Int): Column =
    TextNativeExpressions.simhash_native(hashedTokens, bits)

  /** 32-bit SimHash (kept as the narrow entry point). */
  def simhash32(hashedTokens: Column): Column = simhash(hashedTokens, 32)

  /** Composed formulation (one aggregate pass per bit), equality reference. */
  def simhashComposed(hashedTokens: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val vote = aggregate(
        hashedTokens,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
      )
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Composed 32-bit formulation, equality reference. */
  def simhash32Composed(hashedTokens: Column): Column =
    simhashComposed(hashedTokens, 32)
}
