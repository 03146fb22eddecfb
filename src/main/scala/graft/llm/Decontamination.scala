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
    val evalGrams = evalDocs
      .select(explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n)).as("g"))
      .distinct()
      .persist()
    val bloom = evalGrams.stat.bloomFilter("g", math.max(evalGrams.count(), 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // Codegen'd native probe when the engine's functions are registered
    // (GraftSession always registers); a plain session falls back to a
    // Scala-UDF probe of the same sketch — identical semantics
    // (null → dropped under filter), mirrors Embeddings.dot's fallback.
    val probe =
      if (graft.plans.GraftExtensions.registered(corpus.sparkSession))
        call_function("graft_bloom_might_contain", col("g"), lit(bytes))
      else {
        val sketch = bloom
        udf((g: String) => g != null && sketch.mightContainString(g)).apply(col("g"))
      }
    Dedup.scoped(
      corpus
        .select((col(idCol) +: keepCols.map(col)) :+ explode(
          TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), n)).as("g"): _*)
        .filter(probe)
        .join(evalGrams, Seq("g"), "left_semi")
        .select(col(idCol) +: keepCols.map(col): _*)
        .distinct(),
      evalGrams)
  }
}
