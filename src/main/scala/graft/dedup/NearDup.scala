package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.plans.GraftExtensions.intersect_count
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Near-duplicate detection for document corpora — the operators a
  * training-data pipeline runs at 100 TB.
  *
  * Four families, in increasing sophistication:
  *  - exact:     hash-groupBy on a fingerprint (one shuffle on a 128-bit key)
  *  - Jaccard:   blocked pairwise n-gram set overlap (quadratic WITHIN a
  *               block only — callers must block; at scale the block is an
  *               LSH band, below)
  *  - MinHash+LSH: k portable hash mins → banded signatures → bucket join.
  *               Candidate generation is linear + one shuffle on band keys;
  *               only candidates pay the exact-Jaccard verification.
  *  - SimHash:   64→32-bit fingerprint; near-dups = small Hamming distance,
  *               blocked on a signature prefix.
  *
  * All hashing is md5-derived (TextFunctions.hexHash*) so every stage is
  * reproducible in the DuckDB oracle with identical integer arithmetic.
  */
object NearDup {

  // ---------------------------------------------------------------------------
  // Exact
  // ---------------------------------------------------------------------------

  /** Exact-duplicate groups by an arbitrary key expression: one row per
    * group with the canonical (minimum) id and the group size.
    */
  def exactGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  // ---------------------------------------------------------------------------
  // n-gram Jaccard
  // ---------------------------------------------------------------------------

  /** Distinct char-n-gram shingle sets, ready for pairwise comparison. */
  def withShingles(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("shingles", charShingles(col(textCol), n))

  /** Hashed (48-bit long) shingle sets — the hot-path representation.
    * `fast = true` swaps md5 for native xxhash64 (same 48-bit domain):
    * markedly cheaper shingling for production runs, at the cost of DuckDB
    * reproducibility. The exact-Jaccard verification is hash-agnostic, so
    * precision is 1.0 and pair Jaccards are identical in both modes; only
    * borderline candidate recall differs (banding is probabilistic w.r.t.
    * the hash family).
    */
  def withHashedShingles(df: DataFrame, textCol: String, n: Int = 3,
      fast: Boolean = false): DataFrame =
    graft.core.Spread.smallScan(df).withColumn("shingles",
      if (fast) hashedShinglesFast(col(textCol), n) else hashedShingles(col(textCol), n))

  /** Pairwise Jaccard similarity within a blocking key. `uni` is computed
    * as |A|+|B|−|A∩B| (NOT array_union) so both engines do identical exact
    * integer arithmetic; the ratio is one final division.
    *
    * A size-ratio prefilter runs before the intersect: J(A,B) ≥ t implies
    * |A| ≥ t·|B| and |B| ≥ t·|A| (the intersection is at most the smaller
    * set; the union at least the larger), so mismatched-size pairs are
    * discarded on two integer comparisons instead of an O(|A|+|B|) set op.
    * Results are unchanged — it only skips pairs the final filter would
    * reject anyway.
    */
  /** |A∩B| picked by element type: the native IntersectCount for long
    * arrays with assumeSorted (pure linear merge), the composed form
    * otherwise. Long arrays are defensively `array_sort`ed in the per-ROW
    * projection first — a no-op-cost pass for `hashedShingles` output
    * (already sorted) that makes the per-PAIR merge valid for any caller's
    * long shingle column. Sorting never changes set semantics.
    */
  private def isLongShingles(shingled: DataFrame): Boolean =
    shingled.schema("shingles").dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }

  // Long shingle sets are sorted BY CONSTRUCTION (hashedShingles /
  // hashedShinglesFast sort in the kernel), which is what licenses the
  // assumeSorted linear-merge intersect below. No defensive array_sort
  // here: it is an HOF with an implicit comparator lambda
  // (CodegenFallback), and it evicted the whole shingle projection from
  // whole-stage codegen (round-6 watchdog finding). The equality specs
  // (fused-vs-composed shingles, allpairs-vs-brute-force) pin sortedness.
  private def shingleSide(shingled: DataFrame, c: Column): Column = c

  private def interSize(shingled: DataFrame, a: Column, b: Column): Column =
    if (isLongShingles(shingled)) intersect_count(a, b, assumeSorted = true)
    else size(array_intersect(a, b))

  /** Size-ratio prefilter in EXACT integer arithmetic. J(A,B) >= t implies
    * |A| >= t·|B| and |B| >= t·|A|; the float form `sz >= sz * t` can
    * reject a TRUE boundary pair (|B| = 13, |A| = 20, B ⊂ A, J = 13/20 =
    * 0.65: `20 * 0.65` is 13.000000000000002 in doubles, so `13 >= ...` is
    * false). Rationalizing t to num/10000 with num = floor(t·10000) <= t
    * keeps the filter a strict no-op optimization: every pair the exact
    * Jaccard filter would accept survives it.
    */
  private def sizeRatioOk(szA: Column, szB: Column, minJaccard: Double): Column = {
    val num = math.floor(minJaccard * 10000).toLong
    val den = 10000L
    (szA.cast("long") * den >= szB.cast("long") * num) &&
      (szB.cast("long") * den >= szA.cast("long") * num)
  }

  def jaccardPairs(
      shingled: DataFrame,
      idCol: String,
      blockCol: String,
      minJaccard: Double
  ): DataFrame = {
    val a = shingled.select(col(blockCol).as("block"), col(idCol).as("doc_a"),
      shingleSide(shingled, col("shingles")).as("sh_a"))
    val b = shingled.select(col(blockCol).as("block"), col(idCol).as("doc_b"),
      shingleSide(shingled, col("shingles")).as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      // two empty sets would make jaccard 0/0 = NaN (which Spark's >= keeps
      // but SQL NULL semantics drop) — exclude them explicitly
      .filter(size(col("sh_a")) + size(col("sh_b")) > 0)
      .filter(sizeRatioOk(size(col("sh_a")), size(col("sh_b")), minJaccard))
      .withColumn("inter", interSize(shingled, col("sh_a"), col("sh_b")))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter") * lit(1.0) / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
  }

  // ---------------------------------------------------------------------------
  // AllPairs (prefix-filter) exact similarity join
  // ---------------------------------------------------------------------------

  /** EXACT corpus-wide Jaccard similarity join with NO blocking column and
    * NO probabilistic recall loss — prefix filtering (Bayardo/Ma/Srikant,
    * WWW'07 "Scaling Up All Pairs Similarity Search"; Chaudhuri/Ganti/
    * Kaushik, ICDE'06 SSJoin) plus PPJoin's positional filter and
    * mid-prefix indexing (Xiao/Wang/Lin/Yu, WWW'08 "Efficient Similarity
    * Joins for Near Duplicate Detection"), re-expressed as a Spark
    * dataflow.
    *
    * Principle: order the shingle vocabulary globally by ascending document
    * frequency (rarest first, ties by value). If J(A,B) >= t then
    * |A∩B| >= ceil(t·|A|), and by the prefix lemma the first
    * |A| − ceil(t·|A|) + 1 tokens of A (in the global order) must share at
    * least one token with B's prefix. So only docs co-occurring in some
    * posting list of a PREFIX token can qualify — and prefix tokens are by
    * construction the rarest, so those posting lists are the short ones.
    * Two exact refinements cut the candidate set far below plain prefix
    * filtering (measured 8.1M → ~0.1M on the sf0.1 documents corpus, where
    * the dense char-3-gram vocabulary makes plain prefixes nearly useless):
    *
    *  - MID-PREFIX INDEXING: for a qualifying pair with |x| <= |y| the
    *    required overlap is ceil(t/(1+t)·(|x|+|y|)) >= ceil(2t/(1+t)·|x|),
    *    so the size-SMALLER doc only needs its first
    *    |x| − ceil(2t/(1+t)·|x|) + 1 tokens indexed; the larger doc probes
    *    with its full prefix. The join is ordered by (size, doc_id), so
    *    every unordered pair is generated at most once — no `distinct`.
    *  - POSITIONAL FILTER: let w be the LAST (max in global order) matched
    *    token, at 1-based sorted positions (pa, pb). Every shared token
    *    before w sits inside both joined prefixes (its positions are
    *    smaller), hence IS one of the `o_p` matches; every shared token
    *    after w is bounded by the shorter remaining tail. So
    *    |A∩B| <= o_p + min(|x|−pa, |y|−pb), and a pair survives only if
    *    that bound reaches ceil(t/(1+t)·(|x|+|y|)) — three integer agg
    *    columns (count, max, max) per pair, map-side combinable.
    *
    * Scale shape (all linear-in-corpus shuffles):
    *   1. explode shingles → df per token        (one shuffle, vocab-sized agg)
    *   2. token→df join + per-doc re-sort        (shuffle on token, then doc)
    *   3. probe×index postings join on token     (shuffle on token; quadratic
    *      only within a posting list, and prefix postings are rare tokens)
    *   4. per-pair groupBy → positional filter   (shuffle on pair key)
    *   5. exact verification on survivors        (same intersect_count path
    *      as `jaccardPairs`)
    *
    * All bounds use EXACT integer arithmetic: the threshold is rationalized
    * to num/10000 with num = floor(t·10000) ≤ t, so every computed minimum
    * overlap is ≤ its true-threshold value — a float `ceil(0.65 * 300)` can
    * land on 196 instead of 195 and silently break exact recall.
    * Verification uses the caller's full-precision threshold, so results
    * are exactly the brute-force all-pairs answer (for t > 0; empty-set 0/0
    * pairs are excluded, as everywhere in this module).
    *
    * EAGERNESS: mirrors `minhashLshPairs` — `materialize = true` (default)
    * computes the result, caches it, and releases the shingle intermediate.
    */
  def allPairsJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.65,
      materialize: Boolean = true,
      fastHashing: Boolean = false
  ): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val shingled = withHashedShingles(df, textCol, n, fast = fastHashing)
      .select(col(idCol).as("doc_id"), col("shingles"))
      .filter(size(col("shingles")) > 0)
      .persist()
    // Dense-regime cost-based plan choice (round-16 optimization, guide
    // §1.2 step 1 — fix the distributed algorithm): with vocabulary V and
    // typical set size s, the prefix-posting candidate join materializes
    // ≈ N²·s²/V rows, direct pairwise comparison N² — so for V ≪ s² the
    // posting join is the QUADRATICALLY worse plan (measured 680 executor-
    // CPU-seconds vs ~40 on the sf0.1 documents corpus, V ≈ 5×10², s ≈
    // 2.5×10²). When the whole vocabulary fits a small bitmap, compare
    // documents directly: V-bit bitmaps, AND+popcount per pair.
    val pairs = denseVocab(shingled) match {
      case Some(vocab) => densePairsJaccard(shingled, vocab, minJaccard)
      case None => allPairsVerify(shingled,
        allPairsCandidates(shingled, minJaccard), minJaccard)
    }
    if (!materialize) pairs
    else {
      val out = pairs.cache()
      out.count()
      shingled.unpersist()
      out
    }
  }

  /** Candidate pairs from prefix postings — exposed for recall/efficiency
    * specs. Input must be (doc_id, shingles) with non-empty shingle arrays.
    * Output (doc_a, doc_b) is distinct, doc_a < doc_b (by id), and is a
    * SUPERSET of all pairs with J >= minJaccard (prefix lemma + PPJoin
    * positional bound, both exact) already thinned by the size-ratio
    * filter |A| >= t·|B| ∧ |B| >= t·|A|.
    */
  def allPairsCandidates(shingled: DataFrame, minJaccard: Double): DataFrame = {
    // Rationalized threshold num/den <= minJaccard keeps every integer
    // min-overlap bound sound (see scaladoc above): num/den <= t makes each
    // ceil-bound a lower bound of its true-threshold counterpart, so
    // prefixes only ever get LONGER and pair thresholds only LOWER.
    val num = math.floor(minJaccard * 10000).toLong
    val den = 10000L
    val tok = shingled.select(col("doc_id"), size(col("shingles")).as("sz"),
      explode(col("shingles")).as("t"))
    val dfreq = tok.groupBy("t").agg(count(lit(1)).as("tdf"))
    // Per-doc tokens re-sorted by (df asc, token asc) — array_sort on a
    // struct array orders lexicographically by field position, which is
    // exactly the global frequency order. Probe prefix from the per-doc
    // bound ceil(num·sz/den); index ("mid") prefix from the stronger
    // smaller-side bound ceil(2·num·sz/(den+num)).
    val prefixed = tok.join(dfreq, "t")
      .groupBy("doc_id", "sz")
      .agg(array_sort(collect_list(struct(col("tdf"), col("t")))).as("ordered"))
      .withColumn("toks", transform(col("ordered"), s => s.getField("t")))
      .withColumn("probe_len",
        (col("sz") - floor((lit(num) * col("sz") + lit(den - 1L)) / lit(den)) + lit(1L)).cast("int"))
      .withColumn("index_len",
        (col("sz") - floor((lit(2L * num) * col("sz") + lit(den + num - 1L)) / lit(den + num)) + lit(1L)).cast("int"))
    def postings(lenCol: String): DataFrame = prefixed
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), col(lenCol))))
      // 1-based sorted position for the tail bound sz − pos
      .select(col("doc_id"), col("sz"), (col("pos") + lit(1)).as("pos"), col("col").as("pt"))
    val probe = postings("probe_len")
    val index = postings("index_len")
    // Ordered join — the INDEX side is always the (size, id)-smaller doc, so
    // each unordered pair appears at most once and no distinct is needed.
    // The size-ratio filter also licenses the mid-prefix bound (it needs
    // |x| >= t·|y|, which non-qualifying pairs are free to fail).
    probe.as("y").join(index.as("x"),
        col("x.pt") === col("y.pt") &&
          (col("x.sz") < col("y.sz") ||
            (col("x.sz") === col("y.sz") && col("x.doc_id") < col("y.doc_id"))) &&
          sizeRatioOk(col("x.sz"), col("y.sz"), minJaccard))
      .groupBy(col("x.doc_id").as("id_x"), col("y.doc_id").as("id_y"),
        col("x.sz").as("szx"), col("y.sz").as("szy"))
      .agg(count(lit(1)).as("o_p"), max(col("x.pos")).as("pax"), max(col("y.pos")).as("pay"))
      // PPJoin positional filter: |A∩B| <= o_p + min(tail_x, tail_y) must
      // reach the pair bound ceil(num·(szx+szy)/(den+num)) — all exact ints.
      .filter(col("o_p") + least(col("szx") - col("pax"), col("szy") - col("pay")) >=
        floor((lit(num) * (col("szx") + col("szy")) + lit(den + num - 1L)) / lit(den + num)))
      .select(least(col("id_x"), col("id_y")).as("doc_a"),
        greatest(col("id_x"), col("id_y")).as("doc_b"))
  }

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against
    * the shingled corpus — shared tail of the AllPairs join.
    */
  private def allPairsVerify(
      shingled: DataFrame, candidates: DataFrame, minJaccard: Double): DataFrame = {
    val sa = shingled.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    candidates.select("doc_a", "doc_b")
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("inter", interSize(shingled, col("sh_a"), col("sh_b")))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter") * lit(1.0) / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("inter").cast("int").as("inter"),
        col("uni").cast("int").as("uni"), col("jaccard"))
  }

  /** Dense-regime detection: the corpus's distinct shingle vocabulary, IF
    * it is small enough for the bitmap plan (≤ `spark.graft.allpairs.
    * denseVocabMax` tokens, default 4096 = a 512-byte bitmap per doc).
    * Returns None — keep the sparse posting-list plan — for large
    * vocabularies, or when the dense path is disabled (conf 0), or when
    * the per-doc bitmaps would overflow the broadcast budget
    * (`spark.graft.allpairs.denseBroadcastMaxBytes`, default 128 MB — at
    * that point the N² pair loop needs a partitioned strategy the sparse
    * path already provides). Detection cost: one pass over the exploded
    * shingles (partial-aggregated distinct, collect ≤ V+1 longs) + the
    * persisted frame's count — metadata-scale next to either join.
    */
  private def denseVocab(shingled: DataFrame): Option[Array[Long]] = {
    val spark = shingled.sparkSession
    val maxV = spark.conf.getOption("spark.graft.allpairs.denseVocabMax")
      .map(_.toInt).getOrElse(DenseVocabMaxDefault)
    if (maxV <= 0) return None
    val toks = shingled.select(explode(col("shingles")).as("t"))
      .distinct().limit(maxV + 1)
      .collect().map(_.getLong(0))
    if (toks.length > maxV) return None
    val maxBytes = spark.conf.getOption("spark.graft.allpairs.denseBroadcastMaxBytes")
      .map(_.toLong).getOrElse(DenseBroadcastMaxBytesDefault)
    val nDocs = shingled.count()
    // bitmap words + id + sz + row overhead, per doc, on every executor
    val estBytes = nDocs * (((toks.length + 63) / 64) * 8L + 48L)
    if (estBytes > maxBytes) {
      log.info(s"allPairsJaccard: dense vocab (${toks.length}) but $nDocs docs " +
        s"≈ $estBytes broadcast bytes > $maxBytes — keeping sparse plan")
      None
    } else {
      log.info(s"allPairsJaccard: dense plan (vocab=${toks.length}, docs=$nDocs)")
      Some(toks.sorted)
    }
  }

  val DenseVocabMaxDefault = 4096
  val DenseBroadcastMaxBytesDefault: Long = 128L << 20

  /** Direct pairwise exact-Jaccard join for the dense regime: V-bit
    * bitmaps, one broadcast of the (small) bitmap table, a nested-loop
    * pair scan thinned by the id order + exact size-ratio filter, and an
    * AND+popcount intersection — all inside whole-stage codegen. Output
    * is column- and value-identical to the sparse path (same pairs, same
    * exact integer inter/uni, same single division).
    */
  private def densePairsJaccard(
      shingled: DataFrame, vocab: Array[Long], minJaccard: Double): DataFrame = {
    import graft.functions.DenseSetExpressions.{bitset_from_sorted, bitset_and_count}
    val spark = shingled.sparkSession
    val dense = shingled.select(col("doc_id"), size(col("shingles")).as("sz"),
      bitset_from_sorted(col("shingles"), vocab).as("bits"))
    // pair scan parallelism: the streamed side is N small rows in however
    // few partitions the scan produced — spread it over the cluster
    // (deterministic hash on the id, never round-robin: no pre-shuffle
    // sort, stable under retries)
    val slices = math.max(spark.sparkContext.defaultParallelism * 2, 2)
    val a = dense.repartition(slices, col("doc_id"))
      .select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("bits").as("bits_a"))
    val b = dense
      .select(col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("bits").as("bits_b"))
    a.join(broadcast(b),
        col("doc_a") < col("doc_b") && sizeRatioOk(col("sz_a"), col("sz_b"), minJaccard))
      .withColumn("inter", bitset_and_count(col("bits_a"), col("bits_b")))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jaccard", col("inter") * lit(1.0) / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("inter").cast("int").as("inter"),
        col("uni").cast("int").as("uni"), col("jaccard"))
  }

  // ---------------------------------------------------------------------------
  // Dedup clustering (pairs → groups → canonical representative)
  // ---------------------------------------------------------------------------

  /** Pair-generation strategy for `dedupClusters` — which join produces the
    * near-dup edges the clustering stage consumes.
    */
  sealed trait PairSource
  object PairSource {
    /** EXACT AllPairs prefix-filter join (`allPairsJaccard`): deterministic
      * ground truth, but its verification count grows with true-pair
      * density — the exactness reference, not the corpus-scale default.
      */
    case object Exact extends PairSource

    /** Banded MinHash LSH candidates + exact-Jaccard verification
      * (`minhashLshPairs`): linear candidate generation, hot-bucket guard —
      * the 100 TB default. Recall is probabilistic at the margin
      * (P ≈ 1−(1−j^rows)^bands); every emitted pair is exact-verified.
      */
    final case class MinHashLsh(
        bands: Int = 4,
        rows: Int = 4,
        maxBucketSize: Int = DefaultMaxBucketSize
    ) extends PairSource
  }

  /** The LAST stage of a dedup pipeline: turn near-dup PAIRS into dedup
    * GROUPS and pick one canonical representative per group. Similarity is
    * not transitive, but dedup policy is — if A~B and B~C, keeping both A
    * and C leaves two documents that each near-duplicate B. The industry-
    * standard answer (and the reference's dedup semantics) is connected
    * components over the pair graph, keeping the minimum id per component.
    *
    * The pair graph comes from `pairSource`: `PairSource.MinHashLsh()`
    * (default) bounds candidate generation for corpus scale;
    * `PairSource.Exact` is the deterministic AllPairs ground truth for
    * audits and small corpora. The clustering stage is identical either
    * way, and BOTH compositions are oracle-checked (transitive closure in
    * SQL over the identical pair set — the oracle mirrors the banding).
    *
    * Output: one row per input document —
    * (doc_id, canonical_id, cluster_size, is_canonical). Non-duplicated
    * documents are singleton clusters (canonical_id = doc_id, size 1), so
    * `filter(col("is_canonical"))` IS the deduplicated corpus.
    */
  def dedupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.8,
      fastHashing: Boolean = false,
      pairSource: PairSource = PairSource.MinHashLsh()
  ): DataFrame = {
    val pairs = pairSource match {
      case PairSource.Exact =>
        allPairsJaccard(df, idCol, textCol, n, minJaccard,
          materialize = true, fastHashing = fastHashing)
      case PairSource.MinHashLsh(bands, rows, cap) =>
        minhashLshPairs(df, idCol, textCol, n, minJaccard, bands, rows, cap,
          materialize = true, fastHashing = fastHashing)
    }
    val out = clusterPairs(pairs, "doc_a", "doc_b",
      df.select(col(idCol).as("doc_id")), "doc_id")
    // clusterPairs' ConnectedComponents.labels localCheckpoints its result,
    // so the pair cache (pinned by the pair source's materialization) can
    // be released here instead of living for the rest of the session.
    pairs.unpersist()
    out
  }

  /** The clustering stage alone, for ANY pair source (text LSH, exact
    * AllPairs, embedding LSH, edit-distance blocks…): near-dup PAIRS →
    * connected components → canonical representative. `ids` must hold one
    * row per corpus member (column `idCol`, integral); output columns are
    * (idCol, canonical_id, cluster_size, is_canonical).
    */
  def clusterPairs(pairs: DataFrame, aCol: String, bCol: String,
      ids: DataFrame, idCol: String): DataFrame = {
    val comp = graft.operators.ConnectedComponents.labels(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst")),
      ids.select(col(idCol).as("id")))
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("id").as(idCol), col("component").as("canonical_id"),
        col("cluster_size").cast("int").as("cluster_size"),
        (col("id") === col("component")).as("is_canonical"))
  }

  /** Re-elect each cluster's canonical under a QUALITY policy: "keep the
    * best duplicate, not the lowest id". `scores` carries one row per
    * document (`idCol`, `scoreCol`, integral for cross-engine exactness);
    * within a cluster the canonical becomes the max-score member, ties
    * broken by min id — totally ordered, so the election is deterministic.
    *
    * The cluster IDENTITY (the `canonical_id` the closure produced) is
    * kept as `cluster_id`; only the representative changes. Scale shape:
    * one join of the cluster table with the score table on the id, one
    * map-side-combined `max_by`-style struct-max per cluster, one join
    * back — all keyed shuffles, no windows.
    */
  def electCanonicalBy(
      clusters: DataFrame,
      idCol: String,
      scores: DataFrame,
      scoreCol: String
  ): DataFrame = {
    val scored = clusters.join(scores.select(col(idCol), col(scoreCol)), idCol)
    // min over (isNull, -score, id) structs = (non-null scores first, then
    // max score, then MIN id) — the id rides in the struct un-negated, so
    // the tiebreak is exact for ANY orderable id type (a string id under
    // the old -col(id) negation was implicitly cast to double/null and
    // misordered silently); only the score, documented integral, is
    // negated. The leading isNull field (false < true) makes NULL-scored
    // rows LOSE: struct field ordering otherwise sorts NULL first, so a
    // bare min(struct(-score, id)) would elect a NULL-scored member over
    // every scored one. An all-NULL cluster still elects (min id,
    // canonical_score NULL) rather than vanishing.
    val elect = scored
      .groupBy(col("canonical_id").as("cluster_id"))
      .agg(min(struct(col(scoreCol).isNull.as("__score_null"),
        (-col(scoreCol)).as("__neg_score"), col(idCol).as("__id")))
        .as("__best"))
      .select(col("cluster_id"),
        col("__best.__id").as("best_id"),
        (-col("__best.__neg_score")).as("best_score"))
    scored
      .withColumnRenamed("canonical_id", "cluster_id")
      .join(elect, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("best_id").as("canonical_id"),
        col("best_score").as("canonical_score"),
        (col(idCol) === col("best_id")).as("is_canonical"))
  }

  /** Leakage-safe train/val/test split: the split decision is made on the
    * near-duplicate CLUSTER, not the document — every member of a cluster
    * lands in the same split, so a template shared by two pages can never
    * sit in train AND test at once (the benchmark-contamination failure
    * mode document-keyed splitting invites; Lee et al. measure the
    * resulting eval inflation). Composition of [[dedupClusters]] (LSH
    * pairs → connected components → canonical id) with the deterministic
    * hash split keyed on `canonical_id`.
    *
    * Output: (idCol, canonical_id, cluster_size, split). Scale shape: the
    * clustering dominates (see [[dedupClusters]]); the split itself is a
    * stateless per-row hash gate.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      valBp: Int,
      testBp: Int,
      n: Int = 3,
      minJaccard: Double = 0.8,
      pairSource: PairSource = PairSource.MinHashLsh()
  ): DataFrame = {
    val clusters = dedupClusters(df, idCol, textCol, n, minJaccard,
      pairSource = pairSource)
    graft.sampling.DeterministicSampling.split(
      clusters.select(col(idCol), col("canonical_id"), col("cluster_size")),
      col("canonical_id"), valBp, testBp)
  }

  // ---------------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------------

  /** Mersenne-31: universal-hash modulus. a·h stays < 2^62: h is reduced
    * mod P first (< 2^31) and the multipliers are < 2^31.
    */
  val P: Long = 2147483647L

  /** k=16 fixed (a,b) parameters of the universal hash family
    * h_i(x) = (a_i·x + b_i) mod P. Deterministic so oracle and re-runs
    * agree. The multipliers must be LARGE (here spread over [2^28, 2^31)):
    * a small multiplier barely wraps mod P, so `a·h + b` is monotone in h
    * over most of the domain and every "permutation" selects the same
    * argmin-h shingle — the 16 minhashes collapse to correlated copies and
    * LSH recall becomes an unpredictable artifact of the base hash (this
    * family is the same shape Spark MLlib's MinHashLSH draws randomly).
    */
  val HashParams: Seq[(Long, Long)] = Seq(
    (387414589L, 1093874071L), (700024721L, 490028103L),
    (900119563L, 1312235197L), (1103227859L, 207880621L),
    (1299718327L, 756029389L), (1502261519L, 1950276187L),
    (1700730623L, 328841903L), (1900474051L, 1123940263L),
    (268456729L, 1734568817L), (477218971L, 864023761L),
    (671088667L, 1456789213L), (871829243L, 98765431L),
    (1072693277L, 1678904521L), (1273477139L, 543210917L),
    (1474260917L, 1987654321L), (1675044701L, 246813579L)
  )

  /** MinHash signature (array of 16 longs) from a HASHED shingle array
    * (48-bit longs from `hashedShingles`). Native one-pass expression: 16
    * running minima over one array walk (the composed form ran k
    * transform+array_min passes, each allocating an intermediate array).
    */
  def minhashSignature(hashedShingles: Column): Column =
    graft.functions.TextNativeExpressions.minhash_sig_native(
      hashedShingles, HashParams.map(_._1), HashParams.map(_._2), P)

  /** Composed formulation, equality reference for the native expression. */
  def minhashSignatureComposed(hashedShingles: Column): Column = {
    val hm = transform(hashedShingles, h => h % P)
    array(HashParams.map { case (a, b) =>
      array_min(transform(hm, h => (lit(a) * h + lit(b)) % P))
    }: _*)
  }

  /** LSH band keys: split the signature into `bands` bands of `rows` each;
    * docs sharing ANY full band become candidates. (bands=4, rows=4 over
    * k=16 ⇒ P(candidate) ≈ 1−(1−j⁴)⁴.)
    */
  def bandKeys(sig: Column, bands: Int = 4, rows: Int = 4): Column =
    array((0 until bands).map { b =>
      concat_ws("-", slice(sig, b * rows + 1, rows).cast("array<string>"))
    }: _*)

  /** Default hot-bucket cap for `minhashLshPairs`: band buckets holding more
    * than this many docs are dropped from candidate generation (with a
    * logged count). A degenerate corpus — millions of empty or boilerplate
    * docs sharing one signature — would otherwise re-quadratize the bucket
    * self-join into a single hot task. Shared with the DuckDB oracle so
    * both engines drop identical buckets.
    */
  val DefaultMaxBucketSize = 10000

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Full pipeline: shingle → signature → banded candidates → exact-Jaccard
    * verification. Returns confirmed pairs (doc_a < doc_b) with their exact
    * Jaccard.
    *
    * Scale shape: candidates come from a shuffle on (band_idx, band_key) —
    * linear in corpus size; the quadratic blow-up is confined to hash
    * buckets, and buckets above `maxBucketSize` are dropped entirely (near-
    * dup detection inside a bucket of ten thousand mutually-similar docs is
    * better served by exact-dedup on the signature itself).
    *
    * EAGERNESS: with `materialize = true` (default) construction runs the
    * job — the confirmed pairs are computed, cached, and the large
    * shingle+signature intermediate cache is released before returning; the
    * oversized-bucket count is logged. Pass `materialize = false` for a
    * fully lazy plan (composable into larger dataflows); the intermediate
    * stays persisted and the caller owns unpersisting it via the returned
    * frame's lineage.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.65,
      bands: Int = 4,
      rows: Int = 4,
      maxBucketSize: Int = DefaultMaxBucketSize,
      materialize: Boolean = true,
      fastHashing: Boolean = false
  ): DataFrame = {
    // Cache the shingled+signed frame: it feeds candidate generation once
    // and verification twice — without persist the whole md5+minhash
    // pipeline would run three times.
    val shingled = withHashedShingles(df, textCol, n, fast = fastHashing)
      .select(col(idCol).as("doc_id"), col("shingles"))
      .withColumn("sig", minhashSignature(col("shingles")))
      .persist()
    val banded = shingled
      .select(col("doc_id"), posexplode(bandKeys(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    // Hot-bucket guard: drop band buckets over the cap from candidate
    // generation. The oversized keys are aggregated to a TINY frame
    // (bounded by corpus/cap) and removed with a left_anti join that AQE
    // turns into a broadcast — the corpus-side self-join below keeps its
    // exchange-reuse (both sides are the same subplan), so the guard adds
    // per-bucket counters, not a second corpus shuffle.
    val oversized = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("__bcnt"))
      .filter(col("__bcnt") > maxBucketSize)
      .select("band_idx", "band_key")
    val sane = banded.join(oversized, Seq("band_idx", "band_key"), "left_anti")
    val candidates = sane.as("x")
      .join(sane.as("y"), Seq("band_idx", "band_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = shingled.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val pairs = candidates
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .filter(size(col("sh_a")) + size(col("sh_b")) > 0) // no 0/0 NaN
      .filter(sizeRatioOk(size(col("sh_a")), size(col("sh_b")), minJaccard))
      .withColumn("inter", interSize(shingled, col("sh_a"), col("sh_b")))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter") * lit(1.0) / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
    if (!materialize) pairs
    else {
      // Materialize the (small) result so the big intermediate cache can be
      // released — otherwise the shingled+signed blocks stay pinned for the
      // session lifetime.
      val out = pairs.cache()
      out.count()
      val dropped = banded.groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("__bcnt"))
        .filter(col("__bcnt") > maxBucketSize).count()
      if (dropped > 0)
        log.warn(s"minhashLshPairs: dropped $dropped band bucket(s) over " +
          s"$maxBucketSize docs from candidate generation")
      shingled.unpersist()
      out
    }
  }

  // ---------------------------------------------------------------------------
  // Incremental dedup: new batch vs historical signature store
  // ---------------------------------------------------------------------------

  /** Signature-store rows for a corpus: (doc_id, shingles, sig). Write this
    * to parquet once per corpus load; `dedupAgainstStore` reads it back for
    * every incoming batch. The store carries the hashed shingle sets (for
    * exact verification) alongside the MinHash signature (for banding) —
    * the standard layout of a continuously-maintained dedup index.
    */
  def minhashSignatureStore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      fastHashing: Boolean = false
  ): DataFrame =
    withHashedShingles(df, textCol, n, fast = fastHashing)
      .select(col(idCol).as("doc_id"), col("shingles"))
      .withColumn("sig", minhashSignature(col("shingles")))
      // provenance marker: a store hashed one way shares NO values with a
      // batch hashed the other, so a mode mismatch would silently report
      // zero duplicates — dedupAgainstStore checks this column when present
      .withColumn("hash_mode", lit(if (fastHashing) "xxh64" else "md5"))

  /** Incremental (batch-vs-corpus) near-dup: which NEW documents
    * near-duplicate something already in the historical store? The
    * continuous-ingest companion to `minhashLshPairs` — instead of
    * re-deduping the whole corpus per load, each batch only joins the
    * store's band index.
    *
    * Scale shape: the store is NEVER re-shingled (signatures are
    * precomputed); its band explosion is a narrow map. The batch side is
    * small by definition, so AQE broadcasts its band keys — the
    * corpus-side join runs WITHOUT shuffling the store. The hot-bucket
    * guard aggregates store-band counts map-side into a tiny oversized-key
    * list (at a real deployment this list is maintained WITH the store as
    * metadata); batch-internal duplicates are `minhashLshPairs` on the
    * batch alone — this operator intentionally reports only cross pairs.
    *
    * Output: (batch_id, corpus_id, jaccard) — confirmed exact-Jaccard
    * matches at `minJaccard`, candidate recall per MinHash banding theory.
    */
  def dedupAgainstStore(
      store: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.65,
      bands: Int = 4,
      rows: Int = 4,
      maxBucketSize: Int = DefaultMaxBucketSize,
      fastHashing: Boolean = false
  ): DataFrame = {
    // Loud guard against the silent-zero-recall trap: a store hashed with
    // the other mode shares no shingle/signature values with this batch.
    // take(1) scans one partition — stores are mode-uniform by
    // construction, so sampling one row is sufficient and cheap.
    if (store.columns.contains("hash_mode")) {
      val expected = if (fastHashing) "xxh64" else "md5"
      store.select("hash_mode").take(1).foreach { r =>
        require(r.getString(0) == expected,
          s"store was built with hash_mode=${r.getString(0)} but this batch " +
            s"uses $expected — pass fastHashing=${!fastHashing} to match")
      }
    }
    // Not persisted: the batch is small by contract, so re-shingling it for
    // the verification join is cheaper than pinning cache blocks from a
    // library call (the round-1 lesson on surprising eager operators).
    val b = minhashSignatureStore(batch, idCol, textCol, n, fastHashing)
    def banded(sigs: DataFrame): DataFrame = sigs
      .select(col("doc_id"), posexplode(bandKeys(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    val storeBands = banded(store)
    val oversized = storeBands.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("__bcnt"))
      .filter(col("__bcnt") > maxBucketSize)
      .select("band_idx", "band_key")
    val sane = storeBands.join(oversized, Seq("band_idx", "band_key"), "left_anti")
    val candidates = banded(b).as("x")
      .join(sane.as("y"), Seq("band_idx", "band_key"))
      .filter(col("x.doc_id") =!= col("y.doc_id")) // re-ingested known doc
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    val sa = b.select(col("doc_id").as("batch_id"), col("shingles").as("sh_a"))
    val sb = store.select(col("doc_id").as("corpus_id"), col("shingles").as("sh_b"))
    candidates
      .join(sa, "batch_id")
      .join(sb, "corpus_id")
      .filter(size(col("sh_a")) + size(col("sh_b")) > 0) // no 0/0 NaN
      .filter(sizeRatioOk(size(col("sh_a")), size(col("sh_b")), minJaccard))
      .withColumn("inter", interSize(b, col("sh_a"), col("sh_b")))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter") * lit(1.0) / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("batch_id", "corpus_id", "jaccard")
  }

  // ---------------------------------------------------------------------------
  // Embedding-cosine near-dup
  // ---------------------------------------------------------------------------

  /** Near-duplicate pairs by embedding cosine within a blocking key
    * (quantized-integer scoring from similarity.CosineTopK — deterministic
    * and oracle-stable). At corpus scale the blocking key would be an LSH
    * bucket or IVF cluster id; any coarse partition bounds the quadratic
    * step.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      minCosine: Double
  ): DataFrame = {
    import graft.similarity.CosineTopK
    val prepped = CosineTopK.prepareNonZero(df, vecCol)
      .select(col(blockCol).as("block"), col(idCol), col("qv"), col("norm2"))
    val a = prepped.select(col("block"), col(idCol).as("vec_a"),
      col("qv").as("qa"), col("norm2").as("na"))
    val b = prepped.select(col("block"), col(idCol).as("vec_b"),
      col("qv").as("qb"), col("norm2").as("nb"))
    a.join(b, Seq("block"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        CosineTopK.cosine(CosineTopK.dotQ(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("block").as("label"), col("cosine"))
  }

  // ---------------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------------

  /** Per-document 32-bit SimHash signatures (plus passthrough columns,
    * e.g. a blocking key for `simhashPairs`).
    */
  /** Token-level SimHash signatures. `bits` picks the signature width:
    * 32 (default) for ≲10⁹ docs; 60 for larger corpora, where wider
    * chunks keep equal-chunk candidate buckets small (SCALING.md). 60 is
    * the widest md5 prefix that stays a nonnegative BIGINT in the oracle.
    */
  /** Column-metadata key carrying a signature's bit width from
    * `simhashSignatures` to `simhashBandedPairs`, so banding can never
    * silently assume the wrong width (a 60-bit signature banded as 32
    * drops the top 28 bits — candidates missed with no error).
    */
  val SimhashBitsKey = "graft.simhash.bits"

  def simhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil,
      bits: Int = 32
  ): DataFrame = {
    require(bits == 32 || bits == 60, s"bits must be 32 or 60, got $bits")
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(SimhashBitsKey, bits.toLong).build()
    // fused tokenize+md5-hash kernel: the composed transform(tokens(..))
    // pair of lambdas evicted SimhashNative's projection from whole-stage
    // codegen (round-6 watchdog finding); values are identical — the
    // kernel reproduces tokens() + hexHash32/60 nibble-exactly
    val hexLen = if (bits == 32) 8 else 15
    df.withColumn("hv",
        graft.functions.TextNativeExpressions.token_md5_hashes(col(textCol), hexLen))
      .withColumn("simhash", graft.functions.TextFunctions.simhash(col("hv"), bits))
      .select(((idCol +: keepCols).map(col) :+ col("simhash").as("simhash", md)): _*)
  }

  /** Near-dup pairs by Hamming distance with SIGNATURE-BAND blocking — the
    * production form (the metadata-block variant below is the quadratic
    * ground-truth baseline). The 32-bit signature is split into `bands`
    * chunks; docs sharing ANY chunk value become candidates (multi-index,
    * Manku/Jain/Sarma WWW'07 shape), then the full-signature Hamming
    * distance is verified.
    *
    * EXACT, not approximate, when `bands > maxHamming`: ≤ maxHamming
    * differing bits can touch at most maxHamming chunks, so at least one
    * chunk is identical (pigeonhole) and every qualifying pair is a
    * candidate. Scale shape: one shuffle on (band_idx, band_key); quadratic
    * work confined to equal-chunk buckets.
    */
  def simhashBandedPairs(
      signatures: DataFrame,
      idCol: String,
      maxHamming: Int,
      bands: Int = 4,
      bits: Int = 0
  ): DataFrame = {
    // width comes FROM the signature frame (simhashSignatures stamps it as
    // column metadata): banding a 60-bit signature as 32 would silently
    // ignore the top 28 bits and miss candidates. bits=0 (default) derives
    // it; an explicit value must agree with the stamp when one is present.
    val stamped: Option[Long] = {
      val md = signatures.schema("simhash").metadata
      if (md.contains(SimhashBitsKey)) Some(md.getLong(SimhashBitsKey)) else None
    }
    val width0 = (bits, stamped) match {
      case (0, Some(w)) => w.toInt
      case (0, None)    => 32 // unstamped caller-built signatures: legacy default
      case (b, Some(w)) =>
        require(b == w.toInt,
          s"simhashBandedPairs: bits=$b but the signature frame is stamped " +
            s"$w-bit ($SimhashBitsKey) — banding at the wrong width silently " +
            "drops candidates")
        b
      case (b, None) => b
    }
    val bits2 = width0
    require(bands > maxHamming,
      s"bands ($bands) must exceed maxHamming ($maxHamming) for exact recall")
    require(bits2 % bands == 0, s"bands ($bands) must divide the $bits2-bit signature")
    val width = bits2 / bands
    val mask  = (1L << width) - 1
    val banded = signatures.select(
      col(idCol).as("doc_id"),
      col("simhash"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))
      }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    banded.as("x")
      .join(banded.as("y"), Seq("band_idx", "band_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      // signature rides along (it is functionally determined by doc_id, so
      // the distinct's cardinality is unchanged) — no join back to sigs
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Embedding near-dup with LSH-bucket blocking — the production form of
    * `embeddingNearDupPairs` (which blocks on a caller metadata column and
    * is kept as the recall baseline). The corpus is hashed once into
    * 2^nBits sign-hyperplane buckets; only same-bucket pairs are scored.
    * Approximate: pairs straddling a hyperplane are missed — recall rises
    * as nBits falls (bigger buckets). One shuffle on the bucket id;
    * quadratic work confined to buckets.
    */
  def embeddingNearDupLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      nBits: Int = 6
  ): DataFrame = {
    import graft.similarity.CosineTopK
    val prepped = CosineTopK.prepareNonZero(df, vecCol)
      .withColumn("bucket", CosineTopK.signLshBucket(col("qv"), nBits))
      .select(col("bucket"), col(idCol), col("qv"), col("norm2"))
    val a = prepped.select(col("bucket"), col(idCol).as("vec_a"),
      col("qv").as("qa"), col("norm2").as("na"))
    val b = prepped.select(col("bucket"), col(idCol).as("vec_b"),
      col("qv").as("qb"), col("norm2").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        CosineTopK.cosine(CosineTopK.dotQ(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("bucket"), col("cosine"))
  }

  /** Near-dup pairs by Hamming distance within a metadata blocking key —
    * the quadratic ground-truth baseline; production near-dup should use
    * `simhashBandedPairs` (signature-band blocking, exact for
    * bands > maxHamming, no unbounded-block risk).
    */
  def simhashPairs(
      signatures: DataFrame,
      idCol: String,
      blockCol: String,
      maxHamming: Int
  ): DataFrame = {
    val a = signatures.select(col(blockCol).as("block"),
      col(idCol).as("doc_a"), col("simhash").as("sh_a"))
    val b = signatures.select(col(blockCol).as("block"),
      col(idCol).as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
