package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics for LLM training-data pipelines: TF-IDF
  * keyword extraction and cross-document duplicated-span profiling.
  *
  * Scale contract shared by both operators: the only things that ever
  * shuffle are (doc id, token) / (doc id, span-hash) pairs and small
  * per-term aggregates — never document bytes — so shuffle volume grows
  * with token count, not corpus byte size, and the per-term side scales
  * with the number of DISTINCT terms (vocabulary / distinct spans), which
  * AQE broadcasts when it is small enough.
  *
  * Reference scope: the reference engine's text pipeline stops at
  * per-document stats; these are the corpus-level companions a training-
  * data pipeline needs on top (keyword extraction for filtering/topic
  * bucketing, duplicated-span fractions for boilerplate detection à la
  * Gopher/FineWeb dup-ngram filters).
  */
object Corpus {

  /** Top-k terms per document by TF-IDF.
    *
    * tf = termCount / docLength; idf is the log-free smoothed reciprocal
    * `(N + 1) / (df + 1)` rather than `ln(N / df)` — free of
    * transcendentals, so Spark and the DuckDB oracle compute
    * bit-identical doubles (JVM `Math.log` and libm `log` are not
    * guaranteed to round identically, which would flip rank ties).
    * CAVEAT: linear idf is monotone in df per term, but the tf·idf
    * PRODUCT ordering is not that of log-TF-IDF — it overweights very
    * rare terms (a hapax typo can outrank a genuinely frequent topical
    * term). `minDf` is the practical mitigation: terms in fewer than
    * `minDf` documents are excluded from ranking (2 drops hapaxes; 1 is
    * a no-op). Ranking ties break lexicographically on the token for
    * cross-engine determinism.
    *
    * Plan shape: explode → one (doc, token) count shuffle; doc length re-
    * aggregated from the counts by a window over the doc id; document
    * frequency from a token-keyed second aggregate joined back (equi-join
    * on the token — broadcastable whenever the vocabulary is small); N
    * via a broadcast 1-row cross join so the whole thing stays one lazy
    * plan. A production caller composing several consumers of the
    * (doc, token) counts should persist that frame once.
    *
    * Output: (idCol, token, tf_count, doc_freq, tfidf_raw, rnk), rnk in
    * [1, k]. `tfidf_raw` is the unrounded double — gate wrappers round.
    */
  def tfidfTopK(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      minDf: Int = 1): DataFrame = {
    val id = col(idCol)
    val tf = docs
      .select(id, explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(id, col("token"))
      .agg(count(lit(1)).as("tf_count"))
    val withLen = tf.withColumn("__len",
      sum(col("tf_count")).over(Window.partitionBy(id)))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = withLen
      .join(docFreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf_raw",
        (col("tf_count").cast("double") / col("__len").cast("double")) *
          ((col("__n") + lit(1L)).cast("double") /
            (col("doc_freq") + lit(1L)).cast("double")))
    val w = Window.partitionBy(id).orderBy(col("tfidf_raw").desc, col("token"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(id, col("token"), col("tf_count"), col("doc_freq"),
        col("tfidf_raw"), col("rnk"))
  }

  /** GPT-style sequence-packing layout: documents are (logically)
    * concatenated per source in id order and the token stream is cut into
    * fixed `capacity`-token training windows; each document's row reports
    * its stream offset and the first/last window it lands in (documents
    * straddle window boundaries, as in concat-then-chunk pretraining
    * batchers).
    *
    * The recurrence-free formulation — prefix sum + integer division —
    * keeps packing a pure window plan: partitioned by the source column,
    * scale-out across sources, no sequential driver loop and no stateful
    * UDF. (A no-straddle first-fit variant is a sequential recurrence per
    * source and deliberately not offered: at 100 TB the concat-then-chunk
    * layout is what trainers use, and it parallelizes.)
    *
    * Output: (idCol, sourceCol, n_tokens, tok_offset, pack_first,
    * pack_last, n_packs), all counts as longs.
    */
  def packChunks(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    docs
      .select(col(idCol), col(sourceCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__end", sum(col("n_tokens")).over(w))
      .withColumn("tok_offset", col("__end") - col("n_tokens"))
      .withColumn("pack_first", expr(s"tok_offset div $capacity"))
      .withColumn("pack_last", expr(s"(__end - 1) div $capacity"))
      .withColumn("n_packs", col("pack_last") - col("pack_first") + lit(1L))
      .drop("__end")
  }

  /** Overlapping token-window chunking — the embedding/RAG-prep
    * primitive: each document becomes `1 + ceil(max(n-size,0)/stride)`
    * chunks of up to `size` tokens starting every `stride` tokens (the
    * final chunk may be short; `stride < size` gives overlap). Pure
    * per-row explode + array slicing: no shuffle, chunk count bounded by
    * the document's own length, integer arithmetic only (oracle-exact).
    *
    * Output: (idCol, chunk_idx, chunk_start, chunk_len, chunk_text,
    * chunk_hash) — chunk_start is the 0-based token offset; chunk_hash
    * is md5 of the chunk text (the compact join/dedup key downstream).
    */
  def chunkTokens(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize/stride must be positive: $chunkSize/$stride")
    val id = col(idCol)
    docs
      .select(id, TextFunctions.tokens(col(textCol)).as("__t"))
      // number of chunks minus one: ceil(max(n - chunkSize, 0) / stride),
      // capped so the last chunk still STARTS inside the document — with
      // stride > chunkSize (gapped sampling) the uncapped count would
      // emit a zero-length phantom chunk whose md5("") hash collides
      // across the whole corpus. Pure integer `div`, oracle-identical;
      // the greatest(…, 0) clamp on the cap keeps the formula tokenizer-
      // independent (Spark's `div` truncates toward zero while DuckDB's
      // `//` floors, so an unclamped `-1 div stride` would diverge if a
      // future tokenizer ever yielded an empty array).
      .withColumn("__nc",
        least(
          expr(s"(greatest(size(__t) - $chunkSize, 0) + ${stride - 1}) div $stride"),
          expr(s"greatest(size(__t) - 1, 0) div $stride")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("__nc").cast("long"))))
      .withColumn("chunk_start", col("chunk_idx") * lit(stride.toLong))
      .withColumn("__ct",
        slice(col("__t"), (col("chunk_start") + lit(1L)).cast("int"), lit(chunkSize)))
      .select(id, col("chunk_idx"), col("chunk_start"),
        size(col("__ct")).cast("long").as("chunk_len"),
        array_join(col("__ct"), " ").as("chunk_text"),
        md5(array_join(col("__ct"), " ")).as("chunk_hash"))
  }

  /** RAG-prep composition — chunk, then exact-dedup the chunks: the
    * deduplicated chunk corpus, one row per DISTINCT chunk content with
    * its canonical owner and corpus-wide copy count. This is
    * [[chunkTokens]] feeding an exact dedup on `chunk_hash` (the md5
    * emitted precisely as this downstream key) with a back-reference to
    * the owning document's metadata — all ONE lazy plan.
    *
    * Canonical owner = the lexicographically smallest
    * (id, chunk_idx) holding the content, picked via `min(struct(...))`
    * inside a hash aggregate rather than a window over `chunk_hash`:
    * partial (map-side) aggregation absorbs hot hashes, so a boilerplate
    * chunk with millions of copies costs merged partials, not one
    * straggler task sorting the whole hash's partition. The shuffle key
    * is the 32-char md5 — O(chunks), never chunk text times copies.
    *
    * Output: (chunk_hash, idCol, chunk_idx, chunk_start, chunk_len,
    * chunk_text, n_copies, keepCols…); `keepCols` are joined back from
    * `docs` via an equi-join on the canonical id (broadcastable when the
    * metadata projection is small).
    */
  def chunkDedup(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int, keepCols: Seq[String] = Nil): DataFrame = {
    val chunks = chunkTokens(docs, idCol, textCol, chunkSize, stride)
    val canon = chunks
      .groupBy(col("chunk_hash"))
      .agg(
        min(struct(col(idCol), col("chunk_idx"), col("chunk_start"),
          col("chunk_len"), col("chunk_text"))).as("__c"),
        count(lit(1)).as("n_copies"))
      .select(col("chunk_hash"), col(s"__c.$idCol").as(idCol),
        col("__c.chunk_idx").as("chunk_idx"),
        col("__c.chunk_start").as("chunk_start"),
        col("__c.chunk_len").as("chunk_len"),
        col("__c.chunk_text").as("chunk_text"),
        col("n_copies"))
    if (keepCols.isEmpty) canon
    else canon.join(docs.select(col(idCol) +: keepCols.map(col): _*), Seq(idCol))
  }

  /** Exact corpus-wide heavy hitters (top-`k` tokens) without a full
    * vocabulary shuffle — the two-pass sketch-then-recount shape every
    * 100-TB frequency analysis uses:
    *
    *   1. CANDIDATES: each scan partition runs a Misra–Gries summary of
    *      `capacity` counters over its token stream (`mapPartitions`,
    *      O(capacity) state, decrement-all amortized O(1) per token) and
    *      emits only its surviving keys. Pigeonhole guarantee: a token
    *      absent from EVERY partition summary has local count
    *      < n_p/(capacity+1) in each partition p, so its global count is
    *      < N/(capacity+1) — every token with global count ≥
    *      N/(capacity+1) is a candidate. Summary CONTENT depends on
    *      arrival order (which decrements land where), but the guarantee
    *      — and therefore the final output — does not.
    *   2. RECOUNT: candidates (≤ capacity × partitions rows) broadcast
    *      back as a semi-join filter over the token stream; only
    *      surviving tokens are exactly counted (map-side partials, tiny
    *      shuffle), then ranked. No full-vocabulary aggregate ever runs.
    *
    * Correctness contract: the result equals the plain top-k-by-count
    * whenever the true k-th count is ≥ N/(capacity+1) — size `capacity`
    * to the skew you expect (stopword-heavy natural language saturates
    * far below that bound). Ties break lexicographically.
    *
    * Output: (token, n, rnk), rnk in [1, k] by (n desc, token).
    */
  def heavyHitters(
      docs: DataFrame, textCol: String, k: Int, capacity: Int = 512): DataFrame = {
    require(k > 0 && capacity >= k, s"need capacity >= k > 0: $capacity/$k")
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
    import toks.sparkSession.implicits._
    val candidates = toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        val have = m.getOrElse(t, 0L)
        if (have > 0L) m(t) = have + 1
        else if (m.size < capacity) m(t) = 1L
        else {
          // decrement-all: every counter pays 1; zeroed keys drop out.
          // Snapshot before mutating — updating a mutable map mid-
          // iteration is undefined.
          m.toArray.foreach { case (key, c) =>
            if (c == 1L) m.remove(key) else m(key) = c - 1
          }
        }
      }
      m.keysIterator
    }.toDF("token").distinct()
    val counted = toks
      .join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
    counted
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
      .filter(col("rnk") <= k)
  }

  /** Count–min-sketch counter table over the corpus token stream:
    * `depth` seeded hash rows × `width` buckets, built as ONE
    * aggregation — each token occurrence explodes to `depth`
    * (row, bucket) pairs (`xxhash64(token, row)` keys the rows to
    * independent hash functions) and map-side partial aggregation
    * collapses them, so the shuffle is bounded by depth × width
    * COUNTERS regardless of corpus size or vocabulary. Deterministic:
    * integer counts under seeded hashes — any shuffle order yields the
    * identical table.
    *
    * Output: (d, bucket, cnt) — absent (d, bucket) combinations are
    * zero-count.
    */
  def cmsCounters(
      docs: DataFrame, textCol: String, depth: Int = 4, width: Int = 4096): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width: $depth/$width")
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .select(col("token"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .groupBy(col("d"), pmod(xxhash64(col("token"), col("d")), lit(width.toLong)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[cmsCounters]] table: est(token) = min over
    * the `depth` rows of that row's bucket counter — the classic
    * count–min upper bound (est ≥ true count always; est ≤ true count
    * + ε·N with probability 1 − (1/e)^depth for ε = e/width). The probe
    * side explodes each distinct query token to its `depth` buckets and
    * equi-joins the counter table (depth × width rows — broadcastable),
    * so estimating a candidate set never rescans the corpus.
    *
    * Output: (token, est).
    */
  def cmsEstimate(
      tokens: DataFrame, counters: DataFrame,
      depth: Int = 4, width: Int = 4096): DataFrame =
    tokens
      .select(col("token"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("token"), col("d"),
        pmod(xxhash64(col("token"), col("d")), lit(width.toLong)).as("bucket"))
      .join(broadcast(counters), Seq("d", "bucket"))
      .groupBy(col("token"))
      .agg(min(col("cnt")).as("est"))

  /** Per-document cross-corpus duplicated-span profile: of a document's
    * DISTINCT n-token spans, how many also occur in at least one OTHER
    * document — the corpus-internal repetition signal (boilerplate,
    * templated spam, partial copies) that exact dedup misses and pairwise
    * near-dup only surfaces for whole documents.
    *
    * Spans are md5-hashed before the distinct/shuffle, so the shuffle key
    * is a fixed 32-byte hash regardless of n; span multiplicity is a
    * count over (doc, hash)-distinct rows, i.e. `nd` = number of distinct
    * documents containing the span.
    *
    * Output: (idCol, n_spans, n_dup, dup_frac_raw) — one row per document
    * that has at least one span (every document, given the clamped-gram
    * convention of [[TextFunctions.wordShingles]]).
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val id = col(idCol)
    val spans = docs
      .select(id, explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n)).as("__g"))
      .select(id, md5(col("__g")).as("__h"))
      .distinct()
    val freq = spans.groupBy(col("__h")).agg(count(lit(1)).as("__nd"))
    spans.join(freq, Seq("__h"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__nd") >= 2, lit(1L)).otherwise(lit(0L))).as("n_dup"))
      .withColumn("dup_frac_raw",
        col("n_dup").cast("double") / col("n_spans").cast("double"))
  }

  /** Cross-source overlap matrix: for every pair of sources, how many
    * distinct n-token spans they share and the Jaccard similarity of
    * their span sets — the corpus-curation question "how much of source
    * B is already in source A?" (web snapshots vs curated sets, CC dump
    * N vs N+1) answered before any mixing weights are chosen. Zero-
    * overlap pairs are emitted too (a complete matrix reads as
    * evidence; an absent row reads as a bug).
    *
    * Scale shape: spans are md5-hashed and (source, hash)-distincted
    * first, so the shuffle is O(distinct spans) with a fixed 32-char
    * key; the pair join is keyed on the hash and produces at most
    * |sources|² rows per shared hash (sources number in the dozens, so
    * the join output per key is bounded — no mega-bucket hazard); the
    * matrix assembly joins |sources|-row aggregates. Document text
    * never shuffles.
    *
    * Jaccard is one integer-over-integer division (no rounding nudge
    * needed for the VALUE; gate wrappers round for the hash compare).
    *
    * Output: (source_a, source_b, grams_a, grams_b, n_common,
    * jaccard_raw), one row per unordered source pair with
    * source_a < source_b.
    */
  def sourceOverlap(
      docs: DataFrame, textCol: String, sourceCol: String,
      n: Int = 5): DataFrame = {
    val grams = docs
      .select(col(sourceCol).as("source"), explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n))
        .as("__g"))
      .select(col("source"), md5(col("__g")).as("__h"))
      .distinct()
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    val common = grams.as("a")
      .join(grams.as("b"),
        col("a.__h") === col("b.__h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("__nc"))
    val matrix = sizes.as("sa")
      .join(sizes.as("sb"), col("sa.source") < col("sb.source"))
      .select(col("sa.source").as("source_a"), col("sb.source").as("source_b"),
        col("sa.n_grams").as("grams_a"), col("sb.n_grams").as("grams_b"))
    matrix
      .join(common, Seq("source_a", "source_b"), "left")
      .withColumn("n_common", coalesce(col("__nc"), lit(0L)))
      .withColumn("jaccard_raw", col("n_common") /
        (col("grams_a") + col("grams_b") - col("n_common")))
      .select(col("source_a"), col("source_b"), col("grams_a"),
        col("grams_b"), col("n_common"), col("jaccard_raw"))
  }

  /** Corpus-internal boilerplate REMOVAL: excise every token covered by
    * an n-token span that occurs in at least `minDocs` DISTINCT
    * documents, and keep the rest — the action [[dupSpanStats]] only
    * profiles. This is the CCNet/FineWeb shared-boilerplate scrub
    * (navigation chrome, license headers, templated footers repeat
    * across pages; the prose between them doesn't), corpus-internal
    * where [[Decontamination.scrubSpans]] is vs an external eval set.
    *
    * Plan shape: one posexplode to (doc, position, md5-span-hash) rows;
    * the census (`count(distinct docs)` per hash, via a (doc,hash)-
    * distinct pre-aggregate) and the hit positions are both keyed on
    * the fixed 32-char hash — span text never shuffles twice and the
    * shuffle volume is O(tokens), independent of how hot a span is.
    * Hit positions come back as one small array per affected document;
    * the rebuild is the same per-row interval-coverage surgery as
    * scrubSpans (a token survives iff NO duplicated span covers it).
    * No broadcast of the duplicated-span set is needed — it flows
    * through a distributed semi-join, so a 100-TB corpus with billions
    * of duplicated spans never concentrates on the driver.
    *
    * Returns every document: (idCol, text, n_removed), text rebuilt
    * from kept tokens under the corpus' single-space convention.
    */
  def scrubDuplicateSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2, s"need n > 0, minDocs >= 2: $n/$minDocs")
    val id = col(idCol)
    val grams = docs
      .select(id, posexplode(
        TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n))
        .as(Seq("__p", "__g")))
      .select(id, col("__p"), md5(col("__g")).as("__h"))
    val dupHashes = grams.select(id, col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h"))
    val hits = grams
      .join(dupHashes, Seq("__h"), "left_semi")
      .groupBy(id).agg(collect_list(col("__p")).as("__ps"))
    val toks = TextFunctions.tokens(col(textCol))
    // Coverage via the enumerated hit-interval union: each hit [p, p+n-1]
    // expands once (n positions) and one hash-based array_except removes
    // the union from the position range — O(T + H·n) per document, where
    // the per-position `exists` probe this replaces was O(T·H): quadratic
    // exactly on boilerplate-saturated documents (hits ≈ tokens), the
    // input this operator targets. Same kept set, same ascending order
    // (array_except preserves first-array order), so the rebuilt text is
    // bit-identical.
    val covered = flatten(transform(col("__ps"), p => sequence(p, p + lit(n - 1))))
    val kept = array_except(sequence(lit(0), size(toks) - 1), covered)
    docs
      .join(hits, Seq(idCol), "left")
      .withColumn("__ps", coalesce(col("__ps"), array()))
      .select(id,
        array_join(transform(kept, j => element_at(toks, j + 1)), " ").as(textCol),
        (size(toks) - size(kept)).as("n_removed"))
  }

  /** Unigram-LM familiarity scoring — the transcendental-free stand-in
    * for CCNet's perplexity filter: score each document by how typical
    * its tokens are of the corpus itself. Reported per document:
    *
    *  - `sum_cnt`  = Σ over token POSITIONS of the corpus-wide count of
    *    that token (a long — exact, order-free, engine-independent);
    *  - `familiarity_raw` = sum_cnt / (n_tokens · T) where T is the
    *    corpus token total — the arithmetic mean of per-token unigram
    *    probabilities. Gibberish / rare-token documents score low,
    *    exactly the tail a perplexity filter cuts; unlike mean LOG
    *    probability it needs no `ln`, so the score is ONE division of
    *    exact integers and bit-identical across engines (same reason
    *    [[tfidfTopK]] uses the log-free idf);
    *  - `oov_frac_raw` = fraction of token positions whose token has
    *    corpus count < `minCount` — the vocabulary-coverage filter,
    *    with the vocabulary defined by a count THRESHOLD (not top-k)
    *    so membership is deterministic under ties.
    *
    * Plan shape: one (doc, token) count shuffle, a token-keyed corpus
    * aggregate joined back (equi-join on the token — AQE broadcasts it
    * whenever the vocabulary is small), T as a broadcast 1-row cross
    * join. Integer sums stay within long at 100 TB: a token's corpus
    * count ≤ T ~ 10^13 and per-document positions ~ 10^4 keep
    * `sum_cnt` ≤ 10^17 < 2^63. Like [[tfidfTopK]], the lazy plan
    * recomputes the (doc, token) counts once per consumer branch — a
    * production caller should persist that frame when composing.
    */
  def familiarity(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val id = col(idCol)
    val tf = docs
      .select(id, explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(id, col("token"))
      .agg(count(lit(1)).as("__tf"))
    val cnt = tf.groupBy(col("token")).agg(sum(col("__tf")).as("__cnt"))
    val total = cnt.agg(sum(col("__cnt")).as("__t"))
    tf.join(cnt, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(id, col("__t"))
      .agg(sum(col("__tf")).as("n_tokens"),
        sum(col("__tf") * col("__cnt")).as("sum_cnt"),
        sum(when(col("__cnt") < minCount, col("__tf")).otherwise(lit(0L)))
          .as("__oov"))
      .select(id, col("n_tokens"), col("sum_cnt"),
        (col("sum_cnt").cast("double") /
          (col("n_tokens") * col("__t")).cast("double")).as("familiarity_raw"),
        (col("__oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_frac_raw"))
  }

  /** Adjacent character-pair statistics — the scoring step of a BPE
    * tokenizer-training iteration: every adjacent character pair inside
    * every token occurrence, counted corpus-wide, top-k by count with
    * lexicographic tie-break. One explode + one count shuffle; the
    * aggregate output is bounded by the character alphabet squared
    * (not the corpus), so the global rank window ranks a tiny frame at
    * any scale. Output: (pair, cnt, rnk), rnk in [1, k].
    */
  def bpePairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tok = col("__tok")
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .filter(length(tok) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(tok) - 1),
        i => tok.substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("pair"))))
      .filter(col("rnk") <= k)
  }

  /** BPE tokenizer training: learn `merges` byte-pair merges from the
    * corpus. Classic algorithm, Spark-shaped the way every distributed
    * BPE trainer shapes it: the corpus collapses ONCE into the
    * (distinct word, frequency) vocabulary table — the only pass whose
    * cost scales with corpus bytes — and the merge loop then iterates
    * over that vocabulary-sized frame only (cached; ~10^6–10^7 rows for
    * a 100-TB web corpus, independent of corpus size). Each round is
    * one weighted pair-count aggregate (output bounded by the live
    * symbol alphabet squared) plus a 1-ROW argmax collect — the per-
    * round driver traffic is one (pair, count) row, which is what makes
    * an inherently sequential algorithm acceptable: k rounds = k small
    * jobs over the vocab table, no corpus re-scan, no driver data path.
    *
    * Pair counting is per adjacent POSITION (overlaps count, as in
    * reference BPE); merging is the standard left-to-right greedy fold
    * ("aaa" under (a,a) → ["aa","a"]), expressed as a per-row
    * `aggregate` over the symbol array. Ties break lexicographically on
    * the pair for determinism. Stops early when no pair occurs twice.
    *
    * Returns the learned merge table in order: (step, left, right,
    * merged, cnt).
    */
  /** Classifier-based quality scoring (the GPT-3/LLaMA "WebText
    * classifier" methodology, Naive-Bayes-shaped): learn Laplace-
    * smoothed per-token log-odds weights from a labeled slice —
    * `w(t) = ln(((cnt⁺+1)/(tot⁺+V)) / ((cnt⁻+1)/(tot⁻+V)))` — and
    * score every document by its MEAN token log-odds (length-
    * normalized, so long documents don't win by accumulation). The
    * label can come from human annotation, a curated-vs-web split, or
    * any heuristic; training and inference are one lazy plan.
    *
    * Scale shape: one (doc, token) explode; training is a token-keyed
    * aggregate (vocabulary-sized output) plus a 1-row broadcast of the
    * class totals; inference joins the weight table back on the token
    * (AQE broadcasts small vocabularies) and re-aggregates per doc.
    * No driver path, no model object — the "model" IS a DataFrame.
    *
    * `ln` is transcendental and the per-doc sum order-dependent; gate
    * wrappers round (scores carry no rank here, so the +1e-6/round
    * convention fully absorbs the ulps).
    *
    * Output: (idCol, n_tokens, quality_raw).
    */
  def logOddsQuality(
      docs: DataFrame, idCol: String, textCol: String,
      label: org.apache.spark.sql.Column): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id, label.cast("boolean").as("__y"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token")).agg(
      sum(when(col("__y"), lit(1L)).otherwise(lit(0L))).as("__cp"),
      sum(when(col("__y"), lit(0L)).otherwise(lit(1L))).as("__cn"))
    val tot = counts.agg(sum(col("__cp")).as("__tp"),
      sum(col("__cn")).as("__tn"), count(lit(1)).as("__v"))
    val weights = counts.crossJoin(broadcast(tot))
      .select(col("token"), ln(
        ((col("__cp") + lit(1.0)) / (col("__tp") + col("__v"))) /
          ((col("__cn") + lit(1.0)) / (col("__tn") + col("__v")))).as("__w"))
    // LEFT join + coalesce (ADVICE r6): under the "train once, score
    // many batches" pattern, inference tokens outside the training
    // vocabulary must contribute weight 0 and still count in n_tokens —
    // the inner join silently dropped them (and dropped a doc entirely
    // when NO token was seen). Self-training callers (the gate) see the
    // identical result: every token is in the weight table.
    toks
      .join(weights, Seq("token"), "left")
      .groupBy(id)
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__w"), lit(0.0))).as("__sw"))
      .select(id, col("n_tokens"),
        (col("__sw") / col("n_tokens")).as("quality_raw"))
  }

  /** Multiclass Naive-Bayes text classification (the trained upgrade of
    * the n-gram lang-ID heuristic): per-(token, class) Laplace-smoothed
    * log-likelihoods plus a class prior, every document scored against
    * every class and assigned the argmax. The absent-(token, class)
    * smoothing folds into closed form — `score(d, c) = ln(n_c) − ln(N)
    * + Σ_t ln(cnt(t,c)+1) − |d|·ln(tot_c + V)` — so the scoring join
    * only touches EXISTING (token, class) rows (missing pairs
    * contribute ln 1 = 0 to the sum), which is what keeps the plan
    * sparse at a web-corpus vocabulary.
    *
    * Scale shape: one (doc, token) explode; training aggregates are
    * (token × classes)-sized; scoring joins the count table back on
    * the token and aggregates per (doc, class) — classes are a
    * handful, so the per-doc grid is a broadcast cross join. The
    * argmax ranks by the 6-decimal-ROUNDED score (class-name
    * tie-break) per the repo's transcendental convention.
    *
    * The LAZY plan re-derives the token explode for each training
    * aggregate (~8 corpus scans total — committed plan snapshot
    * `docs/plans/llm_lang_classify.txt`); a production caller at
    * corpus scale should `persist()` the exploded (id, label, token)
    * frame — or TRAIN once (persist the vocabulary-sized counts +
    * class stats as tables, the same move as the BM25 index) and
    * score many batches against them.
    *
    * Output: (idCol, label_true, n_tokens, label_pred, score_raw of
    * the winner).
    */
  def nbClassify(
      docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id, col(labelCol).as("__y"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token"), col("__y"))
      .agg(count(lit(1)).as("__c"))
    val classStats = counts.groupBy(col("__y")).agg(sum(col("__c")).as("__tot"))
      .join(docs.groupBy(col(labelCol).as("__y")).agg(count(lit(1)).as("__dn")),
        Seq("__y"))
      .crossJoin(counts.agg(countDistinct(col("token")).as("__v")))
      .crossJoin(docs.agg(count(lit(1)).as("__nd")))
    val sumln = toks.select(id, col("token"))
      .join(counts.withColumnRenamed("__y", "__cls"), Seq("token"))
      .groupBy(id, col("__cls"))
      .agg(sum(ln(col("__c") + lit(1.0))).as("__sl"))
    val base = docs.select(id, col(labelCol).as("label_true"))
      .join(toks.groupBy(id).agg(count(lit(1)).as("n_tokens")), Seq(idCol))
      .crossJoin(broadcast(classStats))
    val scored = base
      .join(sumln.withColumnRenamed(idCol, "__sid"),
        col(idCol) === col("__sid") && col("__y") === col("__cls"), "left")
      .drop("__sid", "__cls")
      .withColumn("__score",
        ln(col("__dn")) - ln(col("__nd")) + coalesce(col("__sl"), lit(0.0)) -
          col("n_tokens") * ln(col("__tot") + col("__v")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("__score") + lit(1e-6), 6).desc, col("__y"))
    scored
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") === 1)
      .select(id, col("label_true"), col("n_tokens"),
        col("__y").as("label_pred"), col("__score").as("score_raw"))
  }

  /** APPLY a trained BPE merge table to the corpus — the inference half
    * of [[bpeTrain]]: words split to character symbols, each merge
    * `(l, r) → l+r` applied in rank order as the same left-to-right
    * greedy non-overlapping fold the trainer uses, per-word tokens
    * concatenated in word order.
    *
    * Dispatch mirrors [[Embeddings.dot]]: when the engine's functions
    * are registered (GraftSession always registers) the native
    * codegen'd [[graft.plans.BpeEncode]] runs — the merge table rides
    * once per stage binary and each row is one tight loop per merge,
    * which is the only shape that survives a production-sized table
    * (10^4–10^5 merges). Otherwise a chain of `aggregate` HOF folds
    * (one per merge — identical algorithm, equivalence-spec-pinned) is
    * built, valid for SMALL merge lists only: the expression tree
    * grows linearly in merges.
    *
    * Per-row, shuffle-free — tokenization rides the scan like quality
    * scoring. Output: (idCol, n_tokens, bpe_text) with `bpe_text` the
    * space-joined token stream (token text can't contain spaces: words
    * are space-split first, merges only concatenate within a word).
    */
  def bpeEncode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks =
      if (graft.plans.GraftExtensions.registered(docs.sparkSession))
        call_function("graft_bpe_encode", col(textCol),
          typedLit(merges.map(_._1)), typedLit(merges.map(_._2)))
      else {
        // the fallback nests one aggregate() fold per merge — a
        // production-sized table would build an expression tree the
        // planner can't survive; fail loudly instead of OOMing Catalyst
        require(merges.size <= 64,
          s"bpeEncode without GraftExtensions supports <= 64 merges " +
            s"(got ${merges.size}); register the extensions for the " +
            "native kernel (GraftSession.build does)")
        val perWord = transform(split(col(textCol), " "), w => {
          val chars = when(length(w) === 0, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), length(w)),
              i => w.substr(i, lit(1))))
          merges.foldLeft(chars) { case (arr, (l, r)) =>
            aggregate(arr, array().cast("array<string>"),
              (acc, s) => when(
                size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(concat(acc, array(s))))
          }
        })
        flatten(perWord)
      }
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), size(col("__toks")).as("n_tokens"),
        array_join(col("__toks"), " ").as("bpe_text"))
  }

  def bpeTrain(
      docs: DataFrame, textCol: String, merges: Int): Seq[(Int, String, String, String, Long)] = {
    require(merges > 0, s"merges must be positive, got $merges")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) >= 1)
      .groupBy(col("__tok")).agg(count(lit(1)).as("__freq"))
    var syms = words
      .select(col("__freq"), transform(
        sequence(lit(1), length(col("__tok"))),
        i => col("__tok").substr(i, lit(1))).as("__syms"))
      .cache()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val best = syms
        .filter(size(col("__syms")) >= 2) // 1-symbol words have no pairs
        .select(col("__freq"), explode(transform(
          sequence(lit(1), size(col("__syms")) - 1),
          i => struct(element_at(col("__syms"), i).as("l"),
            element_at(col("__syms"), i + 1).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("__freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // exactly ONE (pair, count) row per round
      if (best.isEmpty || best(0).getLong(2) < 2) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        val merged = l + r
        learned += ((step, l, r, merged, best(0).getLong(2)))
        val next = syms.select(col("__freq"), aggregate(
          col("__syms"), array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(s)))).as("__syms"))
          .cache()
        next.count() // materialize before dropping the parent from cache
        syms.unpersist()
        syms = next
        step += 1
      }
    }
    syms.unpersist()
    learned.toSeq
  }
}
