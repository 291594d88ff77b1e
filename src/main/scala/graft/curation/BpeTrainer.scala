package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding merge training — the subword-tokenizer-training step
  * of an LLM data pipeline (Sennrich et al., ACL'16), Spark-first.
  *
  * Scale design: BPE statistics are a function of the WORD FREQUENCY
  * table, not the raw corpus — so the corpus is scanned ONCE (tokenize →
  * explode → count), and every merge round then runs on the compact
  * (word, count) table: ~10⁵–10⁷ distinct words regardless of corpus
  * size. Each round is one map-side-combined aggregation for the global
  * best pair (a single-row argmax collected to the driver — the merge
  * DECISION is inherently sequential in BPE) plus one narrow transform
  * applying the merge; `localCheckpoint` truncates the iterative lineage
  * every round, as in `ConnectedComponents`.
  *
  * Determinism: ties on pair count break lexicographically (left, then
  * right symbol), so the merge sequence is a pure function of the corpus —
  * identical across runs, partitionings, and cluster sizes.
  *
  * The merge-application step is a pure Column fold (`aggregate` with an
  * (acc, carry) struct accumulator): greedy left-to-right, merged symbols
  * don't re-merge within the round — standard BPE single-pass semantics.
  * No UDFs.
  *
  * Correctness gate: the merge table is checked against an independent
  * in-spec reference implementation (`BpeSpec`); the driver gate is
  * rows-only because the per-round global argmax is an iterative
  * algorithm, not expressible as one SQL query for the DuckDB oracle.
  */
object BpeTrainer {

  /** End-of-word marker, appended as a distinct final symbol so merges
    * never cross word boundaries and word-final units stay separable
    * (standard BPE practice).
    */
  val EndOfWord = "</w>"

  /** Character symbols of a word + the end-of-word marker. */
  private def wordSymbols(w: Column): Column =
    concat(filter(split(w, ""), s => s =!= ""), array(lit(EndOfWord)))

  /** Greedy left-to-right application of merge (a, b) → a+b over a symbol
    * array, as one Column expression (aggregate with an (acc, carry)
    * struct accumulator; the carry is the pending previous symbol).
    */
  private[curation] def applyMerge(sym: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("acc"), lit("").as("carry"))
    val step = (st: Column, x: Column) => {
      val acc   = st.getField("acc")
      val carry = st.getField("carry")
      when(carry === "", struct(acc.as("acc"), x.as("carry")))
        .when(carry === a && x === b,
          struct(concat(acc, array(lit(a + b))).as("acc"), lit("").as("carry")))
        .otherwise(
          struct(concat(acc, array(carry)).as("acc"), x.as("carry")))
    }
    val fin = (st: Column) => {
      val acc   = st.getField("acc")
      val carry = st.getField("carry")
      when(carry === "", acc).otherwise(concat(acc, array(carry)))
    }
    aggregate(sym, zero, step, fin)
  }

  /** One corpus scan → (word, n, sym) frequency table. The tokenizer is
    * the NATIVE kernel (value-identical to `tokens`, spec-pinned): the
    * composed split+filter carries a CodegenFallback lambda that ran the
    * whole explode projection interpreted; the scan is spread first so a
    * single-row-group corpus does not tokenize on one core (guide §2.5).
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    graft.core.Spread.smallScan(df)
      .select(explode(
        graft.functions.TextNativeExpressions.tokens_native(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("sym", wordSymbols(col("word")))

  /** Train `numMerges` merges. Returns the ordered merge table:
    * (rank, left, right, merged, pair_count). Stops early (fewer rows)
    * when no adjacent pair occurs at least `minCount` times.
    *
    * `maxBatch > 1` enables EXACT merge batching: each round collects the
    * top-(maxBatch+1) pairs and applies the longest prefix that is
    * provably order-equivalent to one-merge-at-a-time training —
    *  (1) the prefix is CONSECUTIVE in (count desc, left, right) order
    *      and pairwise symbol-DISJOINT, so applying any member leaves the
    *      others' counts untouched;
    *  (2) STRICT count boundary — count(p_m) > count(p_{m+1}): any pair a
    *      batch member's application creates or shrinks is an overlap of
    *      a batch member, hence ranked past the boundary, hence strictly
    *      below every batch member — sequential training would have
    *      picked the whole batch, in this order, regardless of ties
    *      WITHIN the batch;
    *  (3) no merged symbol (left+right) of the batch occurs anywhere in
    *      the current pair table (checked with one cheap filter-count) —
    *      otherwise an existing pair's count could INCREASE past the
    *      boundary mid-batch. Any violation degrades that round to
    *      batch size 1, which is plain sequential training.
    * Exactness over speed: count-plateau regions (long runs of tied
    * counts, typical near minCount) batch as 1 by rule (2) — for bounded
    * vocabularies prefer `trainBpeLocal`, which does zero Spark rounds
    * per merge.
    */
  def trainBpe(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L,
      maxBatch: Int = 1
  ): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = df.sparkSession
    var words = wordTable(df, textCol).select("n", "sym").localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank      = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // adjacent-pair counts weighted by word frequency; pos p (0-based,
      // over sym[1..len-1]) pairs sym[p+1] with sym[p+2] (1-based indexing)
      val pairs = words
        .select(col("n"), col("sym"),
          posexplode(slice(col("sym"), lit(1), size(col("sym")) - 1)))
        .select(col("n"), col("col").as("a"),
          element_at(col("sym"), col("pos") + 2).as("b"))
        .groupBy("a", "b")
        .agg(sum(col("n")).as("pn"))
      val want = math.min(maxBatch, numMerges - rank)
      val top = pairs
        .orderBy(col("pn").desc, col("a"), col("b"))
        .limit(want + 1)
        .collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[Long]("pn")))
        .filter(_._3 >= minCount)
      if (top.isEmpty) exhausted = true
      else {
        var batch = {
          // guard (1): longest consecutive symbol-disjoint prefix
          val seen = scala.collection.mutable.Set.empty[String]
          top.takeWhile { case (a, b, _) =>
            val ok = a != b && !seen(a) && !seen(b)
            if (ok) { seen += a; seen += b }
            ok
          }.take(want).toSeq
        }
        // guard (2): strict count boundary against the next sorted pair
        while (batch.size > 1 && top.length > batch.size &&
            top(batch.size)._3 >= batch.last._3)
          batch = batch.dropRight(1)
        if (batch.size > 1) {
          // guard (3): no merged symbol occurs in the current pair table
          val concats = batch.map { case (a, b, _) => a + b }
          val collisions = pairs
            .filter(col("a").isin(concats: _*) || col("b").isin(concats: _*))
            .limit(1).count()
          if (collisions > 0) batch = batch.take(1)
        }
        batch.foreach { case (a, b, pn) =>
          merges += ((rank, a, b, a + b, pn)); rank += 1
        }
        val prev = words
        words = words
          .withColumn("sym", batch.foldLeft(col("sym")) {
            case (sym, (a, b, _)) => applyMerge(sym, a, b)
          })
          .localCheckpoint()
        // the new checkpoint is eager — the previous round's blocks are
        // dead now and must not pin numMerges copies of the word table
        prev.unpersist()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** BPE training for vocabularies that fit the driver — the production
    * path for corpus-scale training. The CORPUS-sized work (tokenize →
    * explode → count) is one distributed scan; the merge loop then runs on
    * the collected (word, count) table: ~10⁵–10⁷ rows regardless of corpus
    * size, the same bounded-aggregate materialization class as a broadcast
    * (`mixToShares` precedent). Zero Spark jobs per merge — where the
    * per-round distributed loop pays 2 jobs/merge of driver latency, this
    * trains 32k merges in seconds via incremental pair-count maintenance
    * (only words containing the merged pair are touched, max selection by
    * lazy-deletion heap).
    *
    * EXACTLY equal to `trainBpe(…, maxBatch = 1)` and the BpeSpec
    * reference: same (count desc, left, right) selection, same greedy
    * single-pass application, same minCount stop.
    */
  def trainBpeLocal(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L
  ): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    val words = wordTable(df, textCol).select("word", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import spark.implicits._
    LocalBpe.train(words, numMerges, minCount)
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Encode a text column with a trained merge list (applied in rank
    * order — the merge list is a small driver-side artifact, like a
    * broadcast vocabulary). Output column: flattened subword symbols of
    * all tokens. Expression depth grows with the merge count; this is the
    * REFERENCE formulation for arbitrary merge lists — production encoding
    * with trained tables goes through `bpeEncodeTrained` (constant plan
    * depth, codegen'd, table-size-independent per-word cost).
    */
  def bpeEncode(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "bpe_symbols"
  ): DataFrame = {
    val encodeWord = (w: Column) =>
      merges.foldLeft(wordSymbols(w)) { case (sym, (a, b)) => applyMerge(sym, a, b) }
    df.withColumn(outCol, flatten(transform(tokens(col(textCol)), encodeWord)))
  }

  /** Production encode path: one native codegen'd expression carrying the
    * merge-rank table (`functions.BpeEncodeTokens`). Requires a TRAINED
    * (self-consistent) merge table — every merge's operands are base
    * characters or lower-ranked outputs, which everything `trainBpe` /
    * `trainBpeLocal` emits satisfies by construction; the result is then
    * value-identical to `bpeEncode`'s rank-order fold, but plan depth is
    * constant and per-word cost is independent of the table size, so a
    * 32k-merge production tokenizer runs inside whole-stage codegen.
    */
  def bpeEncodeTrained(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "bpe_symbols"
  ): DataFrame =
    // spread first: the per-word encode kernel over a single-row-group
    // corpus otherwise runs on one core (guide §2.5)
    graft.core.Spread.smallScan(df).withColumn(outCol,
      graft.functions.BpeEncodeTokens(col(textCol), merges))

  /** Tokenizer vocabulary for a trained merge table over a given corpus:
    * observed base symbols (distinct code points of the corpus tokens +
    * `</w>`, lexicographically ordered) take ids 0..B-1, merged symbols
    * follow in RANK order — the id assignment every BPE tokenizer ships.
    * One distributed scan for the base alphabet (bounded by the script's
    * code-point count, so the collect is a tiny set).
    */
  def bpeVocabulary(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]
  ): Seq[String] = {
    val base = df
      .select(explode(tokens(col(textCol))).as("word"))
      .select(explode(wordSymbols(col("word"))).as("sym"))
      .distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    base ++ merges.map { case (a, b) => a + b }
  }

  /** Production encode-to-IDS path: the int stream a training pipeline
    * materializes. Same native kernel and codegen shape as
    * `bpeEncodeTrained`; ids come from `bpeVocabulary`'s assignment,
    * out-of-vocabulary symbols map to `oovId`.
    */
  def bpeEncodeIds(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      vocab: Seq[String],
      oovId: Int = -1,
      outCol: String = "bpe_ids"
  ): DataFrame =
    graft.core.Spread.smallScan(df).withColumn(outCol,
      graft.functions.BpeEncodeIds(col(textCol), merges, vocab, oovId))

  /** Decode an id stream back to text: ids → vocabulary symbols,
    * concatenated, `</w>` restored to word boundaries. For any in-vocab
    * id stream, `bpeDecodeIds(bpeEncodeIds(text)) == text` up to
    * whitespace normalization (tokenization collapses runs) — the
    * round-trip BpeSpec proves. Cold path (audits, sampling inspection),
    * so composed built-ins are fine here; unknown ids decode to "".
    */
  def bpeDecodeIds(
      df: DataFrame,
      idsCol: String,
      vocab: Seq[String],
      outCol: String = "decoded_text"
  ): DataFrame = {
    val vocabArr = typedlit(vocab)
    df.withColumn(outCol,
      trim(regexp_replace(
        // get() is 0-based and null-safe (element_at would raise on the
        // OOV id −1); unknown ids decode to ""
        concat_ws("", transform(col(idsCol),
          id => coalesce(get(vocabArr, id), lit("")))),
        java.util.regex.Pattern.quote(EndOfWord), " ")))
  }
}

/** Driver-local exact BPE trainer over a collected (word, count) table —
  * the merge loop of `trainBpeLocal`. Incremental pair-count maintenance:
  * a merge touches only the words that contain its pair (tracked by an
  * inverted index), and the per-round argmax pops from a lazy-deletion
  * max-heap keyed (count, left, right) — entries are re-pushed whenever a
  * pair's count changes and validated against the live count on pop.
  * Complexity ≈ O(total_symbols + Σ touched_word_lengths · log), versus
  * O(numMerges · total_symbols) for the naive rescan.
  */
private[graft] object LocalBpe {

  def train(
      words: Array[(String, Long)],
      numMerges: Int,
      minCount: Long
  ): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    // Symbols interned to dense Int ids and pairs packed into one Long —
    // the merge loop then runs on primitive arrays and LongMaps instead of
    // (String, String) tuple keys (every position probe was a full string
    // compare, every map op a tuple hash; round-16 driver-bench profiling
    // put the 1024-merge train loop at ~10 s single-threaded). The merge
    // ORDER is unchanged: counts are identical and the tie-break still
    // compares the SYMBOL STRINGS (ids are not lexicographic).
    val symTable = mutable.ArrayBuffer.empty[String]
    val symId = mutable.HashMap.empty[String, Int]
    def intern(s: String): Int =
      symId.getOrElseUpdate(s, { symTable += s; symTable.length - 1 })
    val eow = intern(BpeTrainer.EndOfWord)

    val syms: Array[Array[Int]] = words.map { case (w, _) =>
      val b = mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < w.length) {
        val c = Character.charCount(w.codePointAt(i))
        b += intern(w.substring(i, i + c))
        i += c
      }
      b += eow
      b.toArray
    }
    val n = words.map(_._2)

    def pack(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    def left(p: Long): Int = (p >>> 32).toInt
    def right(p: Long): Int = p.toInt

    val pairCount = mutable.LongMap.empty[Long]
    // inverted index: pair -> word ids that MAY contain it (lazily stale —
    // a word is re-verified by scan before being touched)
    val pairWords = mutable.LongMap.empty[mutable.BitSet]
    // max-heap by (count, then lexicographically SMALLEST pair wins ties —
    // compared on the SYMBOL STRINGS, exactly the pre-interning order)
    implicit val ord: Ordering[(Long, Long)] =
      new Ordering[(Long, Long)] {
        def compare(x: (Long, Long), y: (Long, Long)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = symTable(left(y._2)).compareTo(symTable(left(x._2)))
            if (a != 0) a
            else symTable(right(y._2)).compareTo(symTable(right(x._2)))
          }
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, Long)]

    def register(p: Long, delta: Long, wi: Int): Unit = {
      val c = pairCount.getOrElse(p, 0L) + delta
      if (c == 0L) pairCount.remove(p) else pairCount(p) = c
      if (delta > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
    }

    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi)
      var i = 0
      while (i < s.length - 1) { register(pack(s(i), s(i + 1)), n(wi), wi); i += 1 }
      wi += 1
    }
    pairCount.foreach { case (p, c) => heap.enqueue((c, p)) }

    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // pop the live maximum: stale heap entries (count no longer current)
      // are discarded; every count change re-pushed a fresh entry
      var topCnt = -1L
      var topPair = -1L
      while (topCnt < 0 && heap.nonEmpty) {
        val t = heap.dequeue()
        if (pairCount.getOrElse(t._2, 0L) == t._1) { topCnt = t._1; topPair = t._2 }
      }
      if (topCnt < 0 || topCnt < minCount) done = true
      else {
        val a = left(topPair); val b = right(topPair)
        val abStr = symTable(a) + symTable(b)
        out += ((rank, symTable(a), symTable(b), abStr, topCnt))
        val ab = intern(abStr)
        val changed = mutable.Set.empty[Long]
        // snapshot: register() mutates other pairs' bitsets while we walk
        val members = pairWords.getOrElse(topPair, mutable.BitSet.empty).toArray
        members.foreach { w =>
          val s = syms(w)
          var has = false
          var i   = 0
          while (!has && i < s.length - 1) {
            has = s(i) == a && s(i + 1) == b; i += 1
          }
          if (has) {
            // Incremental pair maintenance: only the pairs AROUND each
            // merge occurrence change — (prev, a) → (prev, ab), the merged
            // (a, b) itself, and (b, next) → (ab, next). The former
            // remove-every-pair / re-add-every-pair pass cost O(|word|)
            // map updates per touched word; this is O(occurrences).
            // (`prev` is read from the NEW array, so back-to-back
            // occurrences compose exactly like the full-rewrite did.)
            val nw = n(w)
            val next = new Array[Int](s.length)
            var len = 0
            i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                if (len > 0) {
                  val prev = next(len - 1)
                  val pOld = pack(prev, a); val pNew = pack(prev, ab)
                  register(pOld, -nw, w); changed += pOld
                  register(pNew, nw, w); changed += pNew
                }
                register(topPair, -nw, w); changed += topPair
                if (i + 2 < s.length) {
                  val nxt = s(i + 2)
                  val pOld = pack(b, nxt); val pNew = pack(ab, nxt)
                  register(pOld, -nw, w); changed += pOld
                  register(pNew, nw, w); changed += pNew
                }
                next(len) = ab; len += 1; i += 2
              } else { next(len) = s(i); len += 1; i += 1 }
            }
            syms(w) = java.util.Arrays.copyOf(next, len)
          }
        }
        pairWords.remove(topPair)
        changed.foreach { p =>
          pairCount.get(p).foreach(c => heap.enqueue((c, p)))
        }
        rank += 1
      }
    }
    out.toSeq
  }
}
