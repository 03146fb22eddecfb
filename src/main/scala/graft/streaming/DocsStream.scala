package graft.streaming

import graft.llm.{Dedup, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface of the LLM ingest pipeline: documents
  * arrive as an unbounded stream (a growing parquet directory here; any
  * source in production) and are screened against the PERSISTED MinHash
  * signature index ([[graft.llm.Dedup.signatureIndex]]) — the streaming
  * twin of the batch ingest operators ([[graft.llm.Dedup.ingestFilter]]).
  *
  * Two composition modes, with different semantics:
  *
  *   - [[indexScreen]] — a PURE streaming plan: stateless stream-static
  *     band joins, so each document's verdict depends only on itself and
  *     the static index. Batching-invariant (any micro-batch carve-up
  *     yields the same rows), which is what makes it oracle-checkable;
  *     the trade is that it does NOT see shard-internal duplicates and
  *     the index does not grow mid-stream.
  *   - `foreachBatch` + [[graft.llm.Dedup.ingestFilter]] — the
  *     production daily-ingest LOOP: each micro-batch is deduped against
  *     the index AND itself, kept docs' signatures are appended to the
  *     index before the next batch. Sequential-batch equivalence and
  *     replay idempotency are pinned by `DocsStreamSpec` (semantics
  *     depend on batch boundaries, so it is a test-pinned property, not
  *     an oracle gate).
  */
object DocsStream {

  /** Schema of the driver's documents table (TESTDATA.md). */
  val docsSchema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

  /** Unbounded stream of documents from a growing parquet directory. */
  def readDocs(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(docsSchema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  /** Stateless stream-static LSH screening: band the streamed shard docs
    * with the SAME deterministic signature pipeline the index was built
    * with, equi-join against the static index's banded inverted lists,
    * and rescore candidates with hash-set Jaccard — emitting one row per
    * `(shard doc, index doc, band)` match at `jaccard >= minJaccard`.
    * Downstream dedups on (id, index_id) and aggregates per doc (a
    * multi-band match is the same pair rescored to the same value).
    *
    * Scale shape: NO streaming state — both joins are stream-static
    * inner joins (band key, then index id for the stored hash sets), so
    * throughput is bounded by the shard side's hashing plus two
    * broadcast-or-shuffled lookups into the (parquet-backed,
    * partition-prunable) index; watermarks and state stores never enter
    * the plan. The mega-bucket guard is computed on the static index
    * side only — dropping non-discriminative inverted lists is an
    * index-build-time policy, so it cannot depend on what the stream
    * happens to contain (batching invariance).
    *
    * CONTRACT (same as [[graft.llm.Dedup.incrementalPairs]]): shard ids
    * must be disjoint from index ids.
    */
  def indexScreen(
      shard: DataFrame, index: DataFrame,
      idCol: String, textCol: String,
      bands: Int = 6, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = 64): DataFrame = {
    val idxBands = index.select(col("id").as("index_id"),
      explode(TextFunctions.lshBandKeysFromSig(col("sig"), bands, rowsPerBand)).as("band"))
    val keep = idxBands.groupBy(col("band"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize)
      .select(col("band"))
    val guarded = idxBands.join(keep, Seq("band"), "left_semi")
    val shardBands = Dedup.signatureIndex(shard, idCol, textCol, bands, rowsPerBand)
      .select(col("id"), col("hs"),
        explode(TextFunctions.lshBandKeysFromSig(col("sig"), bands, rowsPerBand)).as("band"))
    shardBands
      .join(guarded, Seq("band"))
      .join(index.select(col("id").as("index_id"), col("hs").as("__ihs")), Seq("index_id"))
      .select(col("id"), col("index_id"), col("band"),
        TextFunctions.jaccard(col("hs"), col("__ihs")).as("jaccard"))
      .filter(col("jaccard") >= lit(minJaccard))
  }

  /** Build the static side of [[decontamScreen]]: the eval set's
    * distinct n-grams (persisted — probed once per micro-batch) and
    * their serialized Bloom sketch. Caller owns the unpersist after
    * the stream stops.
    */
  def evalGramSketch(
      evalDocs: DataFrame, textCol: String,
      n: Int = 8, fpp: Double = 0.01): (DataFrame, Array[Byte]) = {
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

  /** Stateless streaming DECONTAMINATION screen — the eval-overlap half
    * of ingest ([[indexScreen]] dedups, [[qualityScreen]] filters):
    * every arriving document's n-grams stream through the codegen'd
    * Bloom probe right after the source (per-row bit test, no shuffle)
    * and survivors confirm against the exact eval-gram set with a
    * stream-static LEFT SEMI join — so ~(overlap + fpp·grams) rows
    * reach the join and the Bloom's false positives are invisible, the
    * same shape as the batch `llm_decontaminate_bloom`. No watermark,
    * no state store: one row per contaminated gram OCCURRENCE,
    * batching-invariant; downstream aggregates hits per doc.
    */
  def decontamScreen(
      shard: DataFrame, evalGrams: DataFrame, sketchBytes: Array[Byte],
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val probe =
      if (graft.plans.GraftExtensions.registered(shard.sparkSession))
        call_function("graft_bloom_might_contain", col("g"), lit(sketchBytes))
      else {
        val sketch = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
        udf((g: String) => g != null && sketch.mightContainString(g)).apply(col("g"))
      }
    shard
      .select(col(idCol), explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n)).as("g"))
      .filter(probe)
      .join(evalGrams, Seq("g"), "left_semi")
      .select(col(idCol), col("g"))
  }

  /** Stateless streaming QUALITY screen — the heuristic-filter half of
    * the ingest pipeline ([[indexScreen]] is the dedup half): every
    * arriving document gets the Gopher-style verdict (composite quality
    * score, top-token fraction, duplicated-bigram fraction, keep flag)
    * as pure per-row column math. No join, no watermark, no state
    * store — the verdict is batching-invariant by construction, so the
    * batch oracle replays it exactly for any micro-batch carve-up.
    * The keep decision thresholds the 4-decimal-ROUNDED (+1e-6) metrics
    * — the repo's round-then-compare convention (ADVICE r6: the raw
    * doubles are computed independently by each engine, so a
    * knife-edge document could flip a raw-threshold verdict across
    * engines); the raw columns ride along for the gate's hash.
    */
  def qualityScreen(shard: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    def r4(c: org.apache.spark.sql.Column) = round(c + lit(1e-6), 4)
    shard
      .select(col(idCol),
        TextFunctions.qualityScore(col(textCol)).as("quality_raw"),
        TextFunctions.topTokenFraction(toks).as("top_frac_raw"),
        TextFunctions.dupBigramFraction(toks).as("dup_frac_raw"))
      .withColumn("is_kept",
        r4(col("quality_raw")) >= lit(0.5) && r4(col("top_frac_raw")) <= lit(0.2) &&
          r4(col("dup_frac_raw")) <= lit(0.3))
  }
}
