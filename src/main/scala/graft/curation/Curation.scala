package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fingerprint, hexHash48, tokens, WsChars}

/** Corpus-curation operators a training-data pipeline runs between dedup and
  * export: sequence packing, PII scrubbing, repetition scoring, and
  * benchmark decontamination.
  *
  * All pure Catalyst composition (codegen'd, no UDFs); every nondeterminism
  * source is hashed from row content so results are identical across runs,
  * partitionings, and engines (DuckDB-oracle-verifiable).
  */
object Curation {

  // ---------------------------------------------------------------------------
  // Sequence packing
  // ---------------------------------------------------------------------------

  /** Contiguous sequence packing: assign each document to a context-window
    * pack of `budgetTokens`, GPT-pretraining style — documents are laid out
    * in a deterministic order and a pack boundary falls every
    * `budgetTokens` tokens; a document belongs to the pack its first token
    * lands in.
    *
    * Scale shape: a global running sum would be one partition, so documents
    * are first sharded by a content hash (`shards` ≈ cluster parallelism ×
    * a few) and packed WITHIN shards — each shard is an independent running
    * sum (one shuffle, bounded partitions), which is how multi-worker
    * packing runs in production anyway (each data-loader worker packs its
    * own shard).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      budgetTokens: Int,
      shards: Int,
      salt: String = "pack"
  ): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard",
        pmod(hexHash48(concat(col(idCol).cast("string"), lit(salt))), lit(shards.toLong)))
      .withColumn("start_offset",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", (col("start_offset") / budgetTokens).cast("long"))
  }

  /** Materialize packs from `packSequences` output: one row per
    * (shard, pack_id) with the member payloads concatenated in layout
    * order. One aggregation on the pack key; the in-pack ordering is done
    * with array_sort over collected (offset, id, payload) structs —
    * deterministic under any partitioning (collect_list order is not,
    * the sort makes it so).
    */
  def assemblePacks(
      packed: DataFrame,
      idCol: String,
      nTokensCol: String,
      payload: Column
  ): DataFrame = {
    val member = struct(col("start_offset").as("o"), col(idCol).as("i"), payload.as("p"))
    packed.groupBy("shard", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("pack_tokens"),
        array_join(
          transform(array_sort(collect_list(member)), s => s.getField("p")),
          " ").as("pack_payload"))
  }

  // ---------------------------------------------------------------------------
  // PII scrubbing
  // ---------------------------------------------------------------------------

  /** Conservative patterns shared with the oracle: both are valid (and
    * equivalent) under Java regex and RE2. The URL pattern uses the
    * explicit whitespace class — Java `\s` ≠ RE2 `\s` on vertical tab.
    */
  val UrlRe   = s"https?://[^$WsChars]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Replace URLs then emails with placeholder tokens, counting each.
    * Emails are counted AFTER URL scrubbing so an address embedded in a
    * URL's userinfo is not double-counted.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val noUrl = regexp_replace(col(textCol), UrlRe, "<URL>")
    df.withColumn("n_urls",
        size(regexp_extract_all(col(textCol), lit(UrlRe), lit(0))))
      .withColumn("n_emails",
        size(regexp_extract_all(noUrl, lit(EmailRe), lit(0))))
      .withColumn("clean_text", regexp_replace(noUrl, EmailRe, "<EMAIL>"))
  }

  // ---------------------------------------------------------------------------
  // Repetition / boilerplate scoring
  // ---------------------------------------------------------------------------

  /** Token-bigram repetition score per document: the share of the most
    * frequent bigram in all bigrams, as integer parts-per-million (no
    * float ratios — oracle-hashable). High score ⇒ boilerplate/looping
    * text. Documents with < 2 tokens have no bigrams and are absent from
    * the output (nothing to score).
    *
    * Zero shuffles: the mode-count is per-document state, so it is
    * computed by a native one-pass expression instead of exploding
    * corpus×len bigram rows through two exchanges (the composed shape
    * measured 13× slower at sf0.1 and shuffles ~10¹³ rows at 100 TB for
    * values that never leave their document).
    */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // tokens_native, not tokens(): the composed filter lambda is
    // CodegenFallback and evicted RepetitionStatsNative's projection from
    // whole-stage codegen (round-6 watchdog finding)
    df.select(col(idCol),
        graft.functions.TextNativeExpressions.repetition_stats(
          graft.functions.TextNativeExpressions.tokens_native(col(textCol))).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol),
        col("s.top_bigram_count").as("top_bigram_count"),
        col("s.n_bigrams").as("n_bigrams"))
      .withColumn("rep_ppm",
        expr("(top_bigram_count * 1000000) div n_bigrams"))

  // ---------------------------------------------------------------------------
  // Benchmark decontamination
  // ---------------------------------------------------------------------------

  /** Remove candidate documents whose normalized fingerprint appears in a
    * blocklist corpus (benchmark/eval decontamination). One anti-join on a
    * 128-bit key; the blocklist side is a distinct projection (benchmarks
    * are small → AQE broadcasts it).
    */
  def decontaminate(
      candidates: DataFrame,
      blocklist: DataFrame,
      textCol: String
  ): DataFrame = {
    val blocked = blocklist
      .select(fingerprint(col(textCol)).as("__block_fp")).distinct()
    candidates
      .withColumn("__fp", fingerprint(col(textCol)))
      .join(blocked, col("__fp") === col("__block_fp"), "left_anti")
      .drop("__fp")
  }

  /** N-gram-overlap decontamination — the GPT-3-style contamination rule
    * (exact fingerprints miss paraphrased/embedded eval text): drop a
    * training document when MORE THAN `maxShared` of its distinct word
    * n-grams appear anywhere in the eval set. `maxShared = 0` drops on any
    * single shared n-gram.
    *
    * Returns (survivors, report) — the report carries every dropped doc id
    * with its exact shared-n-gram count, because silently vanishing
    * training docs are un-debuggable at corpus scale.
    *
    * Scale shape: the eval n-gram set is DISTINCT + BROADCAST (eval suites
    * are ≤ millions of n-grams — broadcast-sized by nature, and the build
    * asserts nothing about train size); the train side is one scan,
    * explode of distinct n-grams, a broadcast-hash semi match, and one
    * per-doc count. No shuffle touches the corpus beyond the doc-count
    * agg keyed on the id.
    */
  def decontaminateNgram(
      candidates: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxShared: Long = 0L
  ): (DataFrame, DataFrame) = {
    require(maxShared >= 0, s"decontaminateNgram: maxShared must be >= 0, got $maxShared")
    val evalNgrams = evalSet
      .select(explode(graft.functions.TextNativeExpressions
        .word_ngrams_native(col(textCol), n)).as("__ng"))
      .distinct()
    val sharedCounts = candidates
      .select(col(idCol), explode(graft.functions.TextNativeExpressions
        .word_ngrams_native(col(textCol), n)).as("__ng"))
      .join(broadcast(evalNgrams), "__ng")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("shared_ngrams"))
    val dropped = sharedCounts.filter(col("shared_ngrams") > maxShared)
    // no broadcast hint on the drop list: it's usually tiny (AQE converts
    // to broadcast at runtime) but pathologically-contaminated corpora
    // must degrade to a shuffle join, not a driver OOM
    val survivors = candidates
      .join(dropped.select(col(idCol)), Seq(idCol), "left_anti")
    (survivors, dropped)
  }

  /** Frequency-ranked vocabulary: the `maxSize` most frequent tokens with
    * dense ids (1-based; rank by count desc, token asc — fully
    * deterministic under ties). The tokenizer-artifact build step.
    *
    * Scale: token counting is a map-side-combined agg (exchange carries one
    * row per distinct token per partition); the top-`maxSize` cut compiles
    * to TakeOrderedAndProject (per-partition top-K before the gather), and
    * only the ≤ `maxSize`-row RESULT sees the single-partition id window —
    * bounded by construction, never data-scale.
    */
  def buildVocabulary(
      df: DataFrame,
      textCol: String,
      maxSize: Int,
      minCount: Long = 1L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(explode(filter(split(col(textCol), " "), t => t =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("token"))
      .limit(maxSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  /** Encode documents as token-id sequences against a vocabulary (as built
    * by `buildVocabulary`): out-of-vocabulary tokens become `oovId`. Order
    * is preserved via the position index, not collection order.
    *
    * Scale: posexplode → broadcast vocab join (vocab ≪ corpus) → one
    * shuffle on the doc id to reassemble. The reassembly sort is per-doc
    * (array_sort on ≤ doc-length arrays), not a global order.
    */
  def encodeDocuments(
      df: DataFrame,
      vocab: DataFrame,
      idCol: String,
      textCol: String,
      oovId: Long = -1L
  ): DataFrame = {
    val exploded = df
      .select(col(idCol),
        posexplode(filter(split(col(textCol), " "), t => t =!= ""))
          .as(Seq("__pos", "token")))
    exploded
      .join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("token_id")))),
          s => coalesce(s.getField("token_id"), lit(oovId))
        ).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Split documents into fixed-size overlapping token windows — the
    * segmentation step before embedding (RAG chunks) or sequence packing
    * (pretraining windows). Tokens are literal-space splits (deterministic
    * and engine-portable; plug a real tokenizer upstream by pre-writing a
    * token-array column).
    *
    * Output: one row per chunk — id, `chunk_idx` (0-based), `chunk_text`,
    * `n_chunk_tokens`. Chunks start every `chunkSize - overlap` tokens, so
    * consecutive chunks share `overlap` tokens; the final chunk may be
    * short but always carries at least one NEW token (a start that would
    * cover only already-emitted overlap tokens is not generated — it would
    * be a pure duplicate of the previous chunk's tail). Empty documents
    * emit no chunks.
    *
    * Scale: narrow op — split, generate starts, posexplode, slice; no
    * shuffle, no state. Output rows ≈ input tokens / (chunkSize - overlap),
    * a predictable blow-up the caller sizes partitions for.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(chunkSize > 0, "chunkDocuments: chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "chunkDocuments: need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    // drop empty tokens: split("", " ") is [""] in Spark AND DuckDB, so an
    // empty/multi-space doc would otherwise emit phantom chunks
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val n    = size(toks)
    df.withColumn("__toks", toks)
      .withColumn("__n", n)
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        // last start: the largest offset still adding tokens beyond the
        // previous chunk's overlap (start 0 always emits)
        posexplode(sequence(lit(0), greatest(col("__n") - overlap - 1, lit(0)), lit(step)))
          .as(Seq("chunk_idx", "__start")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), col("__n") - col("__start")).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Deterministic global shuffle for training order: every row gets a
    * dense 1-based `shuffle_pos` drawn from a seeded permutation — the
    * "shuffle the corpus before packing/sharding" step of a training-data
    * pipeline, reproducible across runs, engines, and partitionings.
    *
    * The permutation key is a portable md5-prefix hash of (id, seed)
    * (reproducible in the DuckDB oracle); the dense rank comes from
    * `SurrogateKeys.scalableMode` — a range sort + zipWithIndex, never a
    * single-partition window, so the operator holds at corpus scale.
    * Ties (hash collisions) break on the id, keeping the order total.
    */
  /** Keep exactly ⌊n · fracBp/10000⌋ best rows by (score desc, tiebreak
    * asc) — "keep the top 30% by quality" percentile gating, EXACT by
    * integer rank rather than an approximate-percentile threshold cut
    * (engines interpolate quantiles differently; rank arithmetic is
    * portable, and the tiebreak makes the kept SET a pure function of the
    * data, per the oracle-stability rules). Pass an integral score for
    * cross-engine ordering stability.
    *
    * Scale shape: one map-side-combined count, then a range sort +
    * zipWithIndex (`SurrogateKeys.scalableMode`) — no single-partition
    * window, nothing driver-side beyond the count scalar.
    */
  def keepTopFraction(
      df: DataFrame,
      score: Column,
      tiebreak: Column,
      fracBp: Int
  ): DataFrame = {
    require(fracBp >= 0 && fracBp <= 10000,
      s"fracBp must be in [0, 10000], got $fracBp")
    val keep = df.count() * fracBp / 10000
    graft.gold.SurrogateKeys
      .scalableMode(df, Seq(score.desc, tiebreak.asc), skCol = "__ktf_rank")
      .filter(col("__ktf_rank") <= keep)
      .drop("__ktf_rank")
  }

  /** Distinct word n-grams of a token array, space-joined. Empty array
    * below n tokens (`sequence(1, 0)` would count DOWN — same guard as
    * the char-shingle helpers).
    *
    * This is the COMPOSED equality reference: three HOF lambdas =
    * CodegenFallback = the projection runs interpreted. Production paths
    * use `TextNativeExpressions.word_ngrams_native` (tokenize + n-gram +
    * dedup fused in one codegen'd kernel; spec-asserted value-identical).
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"wordNgrams: n must be >= 1, got $n")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document n-gram novelty: of a document's DISTINCT word n-grams,
    * how many also occur in at least `minDf` documents corpus-wide
    * (boilerplate), and the exact-integer novelty share in ppm —
    * `(n_ngrams - n_common) * 1e6 div n_ngrams` (single division of exact
    * ints, per the oracle-stability rules; documents with fewer than n
    * tokens have no n-grams and get a NULL score). The standard
    * boilerplate/template-detection signal for pretraining curation.
    *
    * Scale shape: distinct (doc, n-gram) pairs → one map-side-combined
    * document-frequency count keyed on the n-gram, one key-partitioned
    * join back, one per-doc aggregation. No driver state, no quadratic
    * step; the n-gram key space is corpus-sized but uniformly
    * hash-partitioned. (Production runs at 100 TB would key on a 64-bit
    * n-gram hash instead of the string — same plan shape; strings keep
    * the operator portably oracle-checkable.)
    */
  def noveltyScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDf: Int
  ): DataFrame = {
    require(minDf >= 1, s"noveltyScore: minDf must be >= 1, got $minDf")
    val pairs = df.select(col(idCol),
      explode(graft.functions.TextNativeExpressions
        .word_ngrams_native(col(textCol), n)).as("__ng"))
    val dfCounts = pairs.groupBy("__ng").agg(count(lit(1)).as("__df"))
    pairs
      .join(dfCounts, "__ng")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(when(col("__df") >= minDf, 1L).otherwise(0L)).as("n_common"))
      .join(df.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("novelty_ppm",
        when(col("n_ngrams") > 0,
          expr("(n_ngrams - n_common) * 1000000 DIV n_ngrams")))
  }

  /** Domain-relevance importance weighting (DSIR-flavored, Xie et al.:
    * data selection by importance resampling over hashed n-gram features):
    * score each corpus document by how much its n-gram instances look like
    * a small TARGET domain sample relative to the corpus itself. Each gram
    * occurrence contributes the add-one-smoothed target/source frequency
    * ratio
    *
    *   r(g) = floor( scale * (ct(g)+1) * (Ts+1)  /  ((cs(g)+1) * (Tt+1)) )
    *
    * (ct/cs = gram instance counts in target/corpus, Tt/Ts their totals —
    * the ratio of smoothed unigram-model probabilities). INTEGER-QUANTIZED
    * on purpose: a log-likelihood sum of doubles is partition-order
    * dependent and cross-engine unstable, while floors of exact integer
    * rationals (DECIMAL arithmetic — the numerator overflows a LONG at
    * corpus scale) sum order-free and oracle-check exactly. Downstream,
    * [[DeterministicSampling.weightedSample]] / [[keepTopFraction]]
    * resample on `importance_avg` — together that IS importance
    * resampling toward the target domain.
    *
    * Scale shape: one gram explode per side, map-side-combined counts,
    * one equi-join of the corpus gram stream with the (broadcastable)
    * count tables, one-row totals broadcast via crossJoin; per-doc
    * aggregation is a keyed shuffle. Nothing driver-side.
    */
  def importanceWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      scale: Long = 1000000L
  ): DataFrame = {
    require(n >= 1, s"importanceWeights: n must be >= 1, got $n")
    require(scale > 0, s"importanceWeights: scale must be > 0, got $scale")
    import org.apache.spark.sql.types.DecimalType
    def gramsOf(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(graft.functions.TextNativeExpressions
        .word_ngrams_all_native(col(textCol), n)).as("__g"): _*)
    val grams    = gramsOf(corpus, col(idCol))
    val tgtGrams = gramsOf(target)
    val cs = grams.groupBy("__g").agg(count(lit(1)).as("__cs"))
    val ct = tgtGrams.groupBy("__g").agg(count(lit(1)).as("__ct"))
    val ts = grams.agg(count(lit(1)).as("__ts"))
    val tt = tgtGrams.agg(count(lit(1)).as("__tt"))
    val num = (lit(scale).cast(DecimalType(38, 0)) *
      (coalesce(col("__ct"), lit(0L)) + lit(1L)) * (col("__ts") + lit(1L)))
    val den = ((col("__cs") + lit(1L)).cast(DecimalType(38, 0)) *
      (col("__tt") + lit(1L)))
    val scored = grams
      .join(cs, "__g")
      .join(ct, Seq("__g"), "left")
      .crossJoin(broadcast(ts))
      .crossJoin(broadcast(tt))
      .withColumn("__r", call_function("div", num, den))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__r")).as("importance_sum"))
    corpus.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("importance_sum"), lit(0L)).as("importance_sum"))
      .withColumn("importance_avg",
        when(col("n_grams") > 0, expr("importance_sum DIV n_grams")))
  }

  /** Statistical bigram-LM quality score (CC-Net-style LM filtering with
    * the corpus itself as the model): train bigram conditional
    * probabilities on the corpus, then score each document by the mean
    * conditional probability of its bigram instances. Low scores mark
    * improbable token sequences (garbled text, wrong-language fragments);
    * rank/threshold on `lm_avg_ppm` to filter.
    *
    * Exact-integer contract: each bigram's conditional probability is
    * `(1e6 * c(w1 w2)) div c_prefix(w1)` (ppm; `c_prefix` counts w1's
    * occurrences as a bigram prefix), a doc's `lm_score_sum` is the BIGINT
    * sum over its instances, and `lm_avg_ppm` one final integer division —
    * fully DuckDB-replayable (q_x_lm_score).
    *
    * Scale shape: the instance stream comes from the fused
    * `word_ngrams_all_native` kernel (tokenize + n-gram in one codegen'd
    * pass, multiplicity preserved); the model is two map-side-combined
    * aggregations (bigram counts, then prefix counts over the MODEL table,
    * not the corpus); scoring joins the vocab²-bounded model back to the
    * instance stream — broadcast when it fits (the default; a 31-word toy
    * vocab here, ≲10⁷ rows for real subword vocabs), hash join otherwise.
    */
  def lmScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      broadcastModel: Boolean = true
  ): DataFrame = {
    val grams = df.select(col(idCol),
      explode(graft.functions.TextNativeExpressions
        .word_ngrams_all_native(col(textCol), 2)).as("__bg"))
    val bg = grams.groupBy("__bg").agg(count(lit(1)).as("__c2"))
    val pref = bg
      .groupBy(substring_index(col("__bg"), " ", 1).as("__w1"))
      .agg(sum("__c2").as("__c1"))
    val model = bg
      .join(pref, substring_index(col("__bg"), " ", 1) === col("__w1"))
      .select(col("__bg"), expr("(1000000 * __c2) DIV __c1").as("__p_ppm"))
    val m = if (broadcastModel) broadcast(model) else model
    grams
      .join(m, "__bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__p_ppm").as("lm_score_sum"))
      .join(df.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score_sum"))
      .withColumn("lm_avg_ppm",
        when(col("n_bigrams") > 0, expr("lm_score_sum DIV n_bigrams")))
  }

  /** Span-level exact-substring dedup (the "dedup inside documents" pass of
    * Lee et al., <i>Deduplicating Training Data Makes Language Models
    * Better</i>): any word `n`-gram occurring at least `minCount` times
    * across the corpus (including repeats WITHIN one document) marks every
    * token it covers, and marked tokens are removed from the document.
    * Document-level dedup (minhash/simhash/exact fingerprint) misses
    * boilerplate repeated inside otherwise-unique pages — headers, license
    * blocks, navigation chrome; this operator removes exactly those spans
    * while keeping the unique remainder.
    *
    * Output: one row per input document — id, `clean_text` (kept tokens
    * re-joined with single spaces; `''` when everything was masked),
    * `n_tokens` (pre-mask), `n_masked`. Documents shorter than `n` tokens
    * have no n-grams and pass through unmasked.
    *
    * Scale shape: the occurrence stream is the fused
    * `word_ngrams_all_native` kernel (tokenize + n-gram in one codegen'd
    * pass; position = array index, so posexplode carries the span start for
    * free); duplicated-gram detection is one map-side-combined count keyed
    * on the gram; the join back is keyed on the gram (hash join — the
    * duplicated-gram set is corpus-sized in the worst case, so no broadcast
    * hint); covered positions explode to ≤ n rows per occurrence and
    * distinct/reassembly shuffles are keyed on the doc id. Nothing is
    * quadratic and no state touches the driver. (At 100 TB, key the gram
    * join on a 64-bit gram hash instead of the string — same plan shape;
    * strings keep the operator DuckDB-replayable here.)
    */
  def maskDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minCount: Int = 2
  ): DataFrame = {
    require(n >= 1, s"maskDuplicateSpans: n must be >= 1, got $n")
    require(minCount >= 2, s"maskDuplicateSpans: minCount must be >= 2, got $minCount")
    val toks = df.select(col(idCol),
      posexplode_outer(tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val occ = df.select(col(idCol),
      posexplode(graft.functions.TextNativeExpressions
        .word_ngrams_all_native(col(textCol), n)).as(Seq("__gpos", "__ng")))
    val dupGrams = occ
      .groupBy("__ng").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select("__ng")
    val covered = occ
      .join(dupGrams, "__ng")
      .select(col(idCol),
        explode(sequence(col("__gpos"), col("__gpos") + lit(n - 1))).as("__pos"))
      .distinct()
    val perDoc = toks
      .join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok"))).as("clean_text"),
        count(col("__tok")).as("__n_kept"))
    df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_masked"))
  }

  def shuffleDeterministic(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    val hashed = df.withColumn("__shuffle_h",
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))),
        1, 15), 16, 10).cast("long"))
    graft.gold.SurrogateKeys.scalableMode(
      hashed, Seq(col("__shuffle_h"), col(idCol)), skCol = "shuffle_pos")
      .drop("__shuffle_h")
  }
}
