package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval overlap detection ("decontamination"). The simple forms
  * live as queries — exact content-hash semi-join (`llm_decontaminate`)
  * and 8-gram semi-join (`llm_decontaminate_ngram`); this object holds
  * the SCALE form: a broadcast Bloom prefilter in front of the exact
  * confirm join.
  */
object Decontamination {

  /** Distinct word n-grams of `evalDocs` (persisted) plus their Bloom
    * sketch bytes — the shared prefilter build of both operators below.
    */
  private def evalGramSketch(
      evalDocs: DataFrame, textCol: String,
      n: Int, fpp: Double): (DataFrame, Array[Byte]) = {
    val evalGrams = evalDocs
      .select(explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n)).as("g"))
      .distinct()
      .persist()
    val bloom = evalGrams.stat.bloomFilter("g", math.max(evalGrams.count(), 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    (evalGrams, bos.toByteArray)
  }

  /** The native codegen'd Bloom probe when the engine's functions are
    * registered (GraftSession always registers), else a Scala-UDF probe
    * of the same sketch — identical semantics (null → dropped under
    * filter).
    */
  private def bloomProbe(df: DataFrame, gram: org.apache.spark.sql.Column,
      bytes: Array[Byte]): org.apache.spark.sql.Column =
    if (graft.plans.GraftExtensions.registered(df.sparkSession))
      call_function("graft_bloom_might_contain", gram, lit(bytes))
    else {
      val sketch = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      udf((g: String) => g != null && sketch.mightContainString(g)).apply(gram)
    }

  /** Corpus documents sharing any word `n`-gram with `evalDocs` —
    * EXACTLY equal to the plain explode → semi-join form, computed with
    * a Bloom prefilter:
    *
    *  1. the eval side's distinct n-grams build a Bloom filter (`fpp`
    *     false-positive rate; ~10 bits per element at 1%), broadcast as
    *     a compact sketch even when the exact gram SET would be too big
    *     to broadcast;
    *  2. corpus grams stream through `mightContain` right after the
    *     scan — a per-row bit probe, no join, no shuffle — dropping
    *     ~(1-fpp) of non-overlapping grams;
    *  3. survivors (true overlaps plus fpp false positives) are
    *     CONFIRMED by the exact semi-join, so the result is identical
    *     to the unfiltered form; only ~(overlap + fpp·grams) rows ever
    *     reach the join.
    *
    * At 100 TB the prefilter is the difference between shuffling every
    * corpus gram and shuffling a sliver. The probe is the codegen'd
    * native expression [[graft.plans.BloomMightContain]] (whole-stage
    * codegen, no per-row serialization tax); the sketch rides the
    * stage's torrent-broadcast task binary, so it ships once per
    * executor.
    *
    * EAGER: materializes (and returns a persisted handle to) the
    * result before returning — see [[Dedup]]'s caching contract;
    * `unpersist()` the returned frame when done.
    */
  def ngramOverlapBloom(
      corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      keepCols: Seq[String] = Nil,
      n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val (evalGrams, bytes) = evalGramSketch(evalDocs, textCol, n, fpp)
    Dedup.scoped(
      corpus
        .select((col(idCol) +: keepCols.map(col)) :+ explode(
          TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n)).as("g"): _*)
        .filter(bloomProbe(corpus, col("g"), bytes))
        .join(evalGrams, Seq("g"), "left_semi")
        .select(col(idCol) +: keepCols.map(col): _*)
        .distinct(),
      evalGrams)
  }

  /** Span REMOVAL decontamination (FineWeb-style): instead of flagging
    * or dropping whole documents, excise exactly the token windows that
    * overlap the eval set and KEEP the rest — at training-corpus scale
    * most contaminated documents are fine outside a quoted benchmark
    * snippet, and dropping them wholesale throws away good tokens.
    *
    * Per document: every word `n`-gram starting at token position `p`
    * (0-based) is probed against the eval set — Bloom prefilter at the
    * scan, exact semi-join confirm, same shape as [[ngramOverlapBloom]]
    * so only ~(overlap + fpp·grams) rows reach the join — and each HIT
    * removes tokens `[p, p+n-1]`. Overlapping hits merge naturally
    * (a token survives iff NO hit covers it). The rebuild is pure
    * per-row column arithmetic: positions come back as one small array
    * per contaminated document (broadcast-join-sized — most documents
    * have none and skip via the left join's null), then one interval-
    * union `array_except` pass keeps the uncovered tokens.
    * O(tokens + hits·n) per row, no shuffle beyond the hit join.
    *
    * Returns every corpus document: `(idCol, text, n_removed)` with
    * `text` rebuilt from the kept tokens (single-space convention of
    * the corpus) — uncontaminated documents pass through with
    * `n_removed = 0`.
    *
    * EAGER: materializes the result before returning (see [[Dedup]]'s
    * caching contract); `unpersist()` the returned frame when done.
    */
  def scrubSpans(
      corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val (evalGrams, bytes) = evalGramSketch(evalDocs, textCol, n, fpp)
    val grams = corpus.select(col(idCol),
      posexplode(TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n))
        .as(Seq("p", "g")))
    val hits = grams
      .filter(bloomProbe(corpus, col("g"), bytes))
      .join(evalGrams, Seq("g"), "left_semi")
      .groupBy(col(idCol)).agg(collect_list(col("p")).as("__ps"))
    val toks = TextFunctions.tokens(col(textCol))
    // Interval-union coverage, O(T + H·n) per row (same fix as
    // [[Corpus.scrubDuplicateSpans]]): enumerate each hit's [p, p+n-1]
    // once and array_except the union out of the position range, instead
    // of probing every token position against every hit (O(T·H), which
    // goes quadratic on heavily contaminated documents). Identical kept
    // set and order.
    val covered = flatten(transform(col("__ps"), p => sequence(p, p + lit(n - 1))))
    val kept = array_except(sequence(lit(0), size(toks) - 1), covered)
    Dedup.scoped(
      corpus
        .join(hits, Seq(idCol), "left")
        .withColumn("__ps", coalesce(col("__ps"), array()))
        .select(col(idCol),
          array_join(transform(kept, j => element_at(toks, j + 1)), " ").as(textCol),
          (size(toks) - size(kept)).as("n_removed")),
      evalGrams)
  }
}
