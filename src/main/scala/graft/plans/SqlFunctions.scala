package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{FloatVecDot, LongVecDot, RepetitionStatsNative, RollingHashNative, SignLshBucketNative, SimhashNative, TextFunctions => TF}

/** SQL-callable registration of the engine's text/vector kernels.
  *
  * The reference's third entry point is plain SQL over the catalog (Athena
  * DQ/monitoring — SURVEY §3.3, reference `Meta_Guideline.md` module 07):
  * a user who lives in `spark.sql(...)` should not need the Scala Column
  * API to reach the curation/dedup primitives. Installed by
  * `GraftExtensions`, so every `GraftSession` exposes them; resolution is
  * analyzer-time, zero runtime overhead — the builders emit exactly the
  * same Catalyst expressions as the Scala API, so plans (and the DuckDB
  * oracles) are identical whichever surface built them.
  *
  * Composed functions (`graft_tokens`, `graft_fingerprint`, ...) return the
  * Column-API expression tree un-resolved; the analyzer's fixed-point pass
  * resolves the nested built-ins exactly as if the user had typed the
  * expansion. Native kernels (`graft_rolling_hash`, `graft_simhash`, ...)
  * bind the codegen'd expression directly.
  *
  * Static int parameters (simhash width, LSH bits/stride) must be literal
  * integers: they are baked into generated code, so a per-row column value
  * has no meaning — the builders reject non-literals with a named error.
  */
object SqlFunctions {

  private type Builder = Seq[Expression] => Expression
  private type Reg     = (FunctionIdentifier, ExpressionInfo, Builder)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(SqlFunctions.getClass.getCanonicalName, null, name, usage, "")

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")

  private def litInt(name: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType)  => v
    case Literal(v: Long, LongType)    => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$name: $arg must be a literal integer, got ${other.sql}")
  }

  private def litLong(name: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType)   => v
    case other =>
      throw new IllegalArgumentException(
        s"$name: $arg must be a literal integer, got ${other.sql}")
  }

  /** Register a 1-arg Column-composed function. Eager node conversion is
    * load-bearing: the lazy wrapper `ColumnBridge.expression` returns
    * reports VOID type and fails enclosing higher-order functions'
    * type checks (see `ColumnBridge.convertedExpression`).
    */
  private def composed1(name: String, usage: String)(f: Column => Column): Reg =
    (new FunctionIdentifier(name), info(name, usage), (args: Seq[Expression]) => {
      arity(name, 1, args)
      ColumnBridge.convertedExpression(f(ColumnBridge.column(args.head)))
    })

  /** All registrations; `GraftExtensions` injects each. */
  def registrations: Seq[Reg] = Seq(
    composed1("graft_tokens",
      "graft_tokens(text) - whitespace tokens, empties removed")(TF.tokens),
    composed1("graft_token_count",
      "graft_token_count(text) - number of whitespace tokens")(TF.tokenCount),
    composed1("graft_normalize",
      "graft_normalize(text) - lowercase, strip all but [a-z0-9 ]")(TF.normalize),
    composed1("graft_fingerprint",
      "graft_fingerprint(text) - md5 of the normalized text")(TF.fingerprint),
    composed1("graft_hex_hash48",
      "graft_hex_hash48(s) - first 12 md5 hex chars as a 48-bit long")(TF.hexHash48),
    composed1("graft_hex_hash32",
      "graft_hex_hash32(s) - first 8 md5 hex chars as a 32-bit long")(TF.hexHash32),
    composed1("graft_lang_id",
      "graft_lang_id(tokens) - stopword-marker language id (en/de/fr/unk)")(TF.langId),

    (new FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash",
        "graft_rolling_hash(text) - polynomial rolling hash mod 1e9+7"),
      (args: Seq[Expression]) => {
        arity("graft_rolling_hash", 1, args)
        RollingHashNative(args.head)
      }),

    (new FunctionIdentifier("graft_token_hashes"),
      info("graft_token_hashes",
        "graft_token_hashes(text[, hex_len]) - md5-prefix hashes of the " +
          "whitespace tokens, fused kernel (default hex_len 8 = 32-bit)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_token_hashes expects 1 or 2 arguments, got ${args.length}")
        val hexLen =
          if (args.length == 2) litInt("graft_token_hashes", "hex_len", args(1)) else 8
        graft.functions.TokenHashesNative(args.head, hexLen)
      }),

    (new FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(hashed_tokens[, bits]) - SimHash signature (default 32 bits)"),
      (args: Seq[Expression]) => {
        if (args.length != 1 && args.length != 2)
          throw new IllegalArgumentException(
            s"graft_simhash expects 1 or 2 arguments, got ${args.length}")
        val bits =
          if (args.length == 2) litInt("graft_simhash", "bits", args(1)) else 32
        require(bits >= 1 && bits <= 63,
          s"graft_simhash: bits must be in [1, 63], got $bits")
        SimhashNative(args.head, bits)
      }),

    (new FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams",
        "graft_word_ngrams(text, n) - distinct space-joined word n-grams"),
      (args: Seq[Expression]) => {
        arity("graft_word_ngrams", 2, args)
        graft.functions.WordNgramsNative(args.head,
          litInt("graft_word_ngrams", "n", args(1)))
      }),

    (new FunctionIdentifier("graft_repetition_stats"),
      info("graft_repetition_stats",
        "graft_repetition_stats(tokens) - struct(top_bigram_count, n_bigrams)"),
      (args: Seq[Expression]) => {
        arity("graft_repetition_stats", 1, args)
        RepetitionStatsNative(args.head)
      }),

    (new FunctionIdentifier("graft_long_dot"),
      info("graft_long_dot",
        "graft_long_dot(a, b) - exact integer dot of two array<long> vectors"),
      (args: Seq[Expression]) => {
        arity("graft_long_dot", 2, args)
        LongVecDot(args.head, args(1))
      }),

    (new FunctionIdentifier("graft_float_dot"),
      info("graft_float_dot",
        "graft_float_dot(a, b) - double dot of two array<float> vectors"),
      (args: Seq[Expression]) => {
        arity("graft_float_dot", 2, args)
        FloatVecDot(args.head, args(1))
      }),

    (new FunctionIdentifier("graft_sign_lsh_bucket"),
      info("graft_sign_lsh_bucket",
        "graft_sign_lsh_bucket(qvec, nBits, stride) - sign-hyperplane LSH bucket"),
      (args: Seq[Expression]) => {
        arity("graft_sign_lsh_bucket", 3, args)
        SignLshBucketNative(args.head,
          litInt("graft_sign_lsh_bucket", "nBits", args(1)),
          litLong("graft_sign_lsh_bucket", "stride", args(2)))
      })
  )

  def install(e: SparkSessionExtensions): Unit =
    registrations.foreach(e.injectFunction)
}
