package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for LLM training-data pipelines: tokenizing,
  * quality scoring, language ID, shingling, MinHash and SimHash — all
  * composed from codegen'd `org.apache.spark.sql.functions` (no UDFs in
  * the hot path; every function here stays inside whole-stage codegen and
  * needs zero shuffles by itself).
  *
  * Hash choice: every content hash is md5 (hex string). Not for speed —
  * xxhash64 would be faster — but md5 is identical across Spark, DuckDB,
  * Python and friends, which makes the whole pipeline independently
  * re-computable by the correctness oracle. Swap `md5` for `xxhash64` in
  * production if oracle parity is not needed.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, and runs of
    * other non-space symbols each count as one token — the pre-merge
    * vocabulary shape of byte-pair tokenizers.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"))

  /** Sliding word n-grams; shorter texts yield their single clamped gram. */
  def wordShingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** Sliding character n-grams. */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
      i => substr(text, i, lit(n)))

  /** PII scrubbing patterns — the anonymization pass every
    * training-data pipeline runs before release. Deliberately the
    * RE2-compatible regex subset (no lookaround, no backreferences,
    * ASCII classes and `\b` only) so Spark's Java regex engine and the
    * DuckDB oracle's RE2 accept the IDENTICAL pattern strings with
    * identical semantics; both engines replace globally (DuckDB needs
    * the explicit 'g' flag — the oracle SQL carries it).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Replace emails, then phone numbers, then IPv4 addresses with typed
    * placeholder tokens. Order is fixed and replacement tokens contain
    * no digits or dots, so later patterns can never match inside an
    * earlier replacement. Pure codegen'd `regexp_replace` chain: per-row
    * work, no shuffle, linear in text length (all three patterns are
    * backtracking-free in practice: character-class quantifiers only).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** One MinHash value: the minimum over shingles of md5(salt || shingle).
    * k salted copies form the classic MinHash signature (string form; the
    * banding path below uses the cheaper universal-hash form).
    */
  def minhash(shingles: Column, salt: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$salt:"), s))))

  /** Universal-hash MinHash parameters: `(a_j * h + b_j) mod P` over a
    * base 32-bit content hash h. a_j < 2^30 and h < 2^32 keep the
    * product under 2^62 — no signed-64 overflow in either Spark or the
    * DuckDB oracle (which errors on BIGINT overflow rather than wraps).
    */
  val MinHashP: Long = (1L << 61) - 1
  def minhashA(j: Int): Long = (2L * j + 1) * 0x9E3779B1L % (1L << 30) | 1L
  def minhashB(j: Int): Long = (j + 1L) * 0x85EBCA77L % (1L << 30)

  /** Per-shingle 32-bit base hashes (first 8 hex digits of md5). */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))

  /** Production fast path: the same 32-bit base-hash contract via
    * xxhash64 (codegen'd, no hex round-trip — the md5 tree dominates the
    * LSH stage, see object doc). NOT oracle-parity: DuckDB has no
    * xxhash64, so pipelines built on this can't be hash-compared — the
    * gate uses [[shingleHashes]]; near-dup RESULTS are equivalent in
    * distribution (any uniform 32-bit hash works for MinHash banding),
    * pinned behaviorally by LlmSpec.
    */
  def shingleHashesFast(shingles: Column): Column =
    transform(shingles, s => pmod(xxhash64(s), lit(1L << 32)))

  /** LSH band keys for banded MinHash: `bands` keys, each hashing
    * `rowsPerBand` consecutive signature values (+ the band index, so one
    * join column carries band identity). Two documents that share ANY
    * band key are near-duplicate candidates — candidate generation is a
    * plain equi-join on the band key: fully shuffle-parallel, never
    * all-pairs.
    *
    * Signature values use ONE md5 per shingle plus k universal-hash
    * transforms — k times less hashing than k salted md5 passes (the
    * md5 tree dominated the LSH stage at scale).
    */
  def lshBandKeys(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    lshBandKeysFromHashes(shingleHashes(shingles), bands, rowsPerBand)

  /** k-slot MinHash signature as an `array<long>` column — the HOF
    * formulation (k × array_min(transform)). The native one-pass twin is
    * `graft_minhash_sig(hs, k)` (graft.plans.MinHashSignature), same
    * values; Dedup picks native when the extension is registered.
    */
  def minhashSignature(hs: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(hs,
        h => (lit(minhashA(j)) * h + lit(minhashB(j))) % lit(MinHashP)))
    }: _*)

  /** Band keys from a materialized signature column. */
  def lshBandKeysFromSig(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map { r =>
        element_at(sig, b * rowsPerBand + r + 1).cast("string")
      }
      md5(concat_ws("|", lit(b.toString) +: parts: _*))
    }
    array(keys: _*)
  }

  /** Same, over a PRE-MATERIALIZED base-hash column (project
    * [[shingleHashes]] into a real column first — otherwise Spark clones
    * the md5 subtree into each of the k signature expressions).
    */
  def lshBandKeysFromHashes(hs: Column, bands: Int, rowsPerBand: Int): Column =
    lshBandKeysFromSig(minhashSignature(hs, bands * rowsPerBand), bands, rowsPerBand)

  /** Distinct-set Jaccard similarity of two shingle arrays.
    * `array_intersect` is hash-based O(n+m) (and distinct-valued, same as
    * DuckDB's `list_intersect`) — a filter+contains formulation is
    * O(n·m) and dominated the rescoring stage at scale.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_distinct(concat(a, b)))
    inter.cast("double") / union.cast("double")
  }

  /** Per-token 32-bit content hashes (first 8 hex digits of md5). */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  /** SimHash over pre-computed token hashes (pass [[tokenHashes]] via a
    * projected column so the md5s are computed once, not once per bit):
    * bit j of the result is 1 iff more tokens have bit j set than not.
    */
  def simhash(hashes: Column, bits: Int = 32): Column =
    (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Document fingerprint: the minimum 3-word-shingle hash (a 1-function
    * MinHash — equal fingerprints are a strong containment signal).
    */
  def fingerprint(text: Column): Column =
    minhash(wordShingles(tokens(text), 3), 0)

  /** Language marker words. Deliberately tiny and deterministic: language
    * ID here is an oracle-checkable n-gram/stopword heuristic, not a
    * model. Ties resolve in declaration order.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "una", "es"),
    "fr" -> Seq("le", "les", "des", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在")
  )

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  /** Predicted language: argmax of marker-word counts, first-wins ties. */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (l, ws) => l -> langScore(toks, ws) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best, lit(l)).otherwise(acc)
    }
  }

  /** English stopwords for the quality score's stopword ratio. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "in", "to", "it")

  /** Composite quality score in [0,1]: length saturation, lexical
    * diversity, and (1 - stopword ratio), fixed 0.3/0.4/0.3 weights.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lenScore = least(n / lit(100.0), lit(1.0))
    val diversity = size(array_distinct(toks)).cast("double") / n
    val stopRatio = langScore(toks, Stopwords).cast("double") / n
    lit(0.3) * lenScore + lit(0.4) * diversity + lit(0.3) * (lit(1.0) - stopRatio)
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * Gopher-style repetition signal (boilerplate and spam concentrate
    * mass on one token; prose doesn't). Pure per-row HOF arithmetic, no
    * shuffle: sort once, then ONE linear fold tracking the longest run
    * of equal adjacent tokens — O(n log n) per document, vs the old
    * `transform(array_distinct, x => size(filter(toks, == x)))` which
    * was O(distinct × tokens): ~10¹⁰ comparisons inside one row for a
    * 100k-token near-unique-vocabulary document, i.e. one straggler
    * task stalling a whole 100-TB quality pass. The value is engine-
    * independent: any total order makes equal tokens adjacent, so the
    * max run equals the max multiplicity regardless of sort tie-breaks
    * (the DuckDB oracle keeps its direct count-per-distinct form).
    */
  def topTokenFraction(toks: Column): Column = {
    // run starts at 0, so a first token equal to the "" sentinel still
    // counts correctly (0+1); best of an empty array stays 0
    val best = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    best.cast("double") / size(toks)
  }

  /** Fraction of word bigrams that are repeats of an earlier bigram
    * (`1 - distinct/total`) — the second Gopher-style repetition signal,
    * catching looped phrases that single-token counts miss.
    */
  def dupBigramFraction(toks: Column): Column = {
    val grams = wordShingles(toks, 2)
    lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams)
  }
}
