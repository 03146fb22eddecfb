package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic DOCUMENT corpus generator — corpus-volume
  * evidence for the dedup family, where the driver's `documents`
  * fixtures (≤2,000 rows) prove correctness but not scale behavior.
  *
  * Shape, chosen to load exactly the paths the dedup operators guard:
  *
  *   - ~10% planted near-duplicates: every `doc_id % 10 == 1` document
  *     re-generates its predecessor's text and mutates ONE token, so
  *     the true pair set is known by construction (`(10k, 10k+1)`
  *     pairs, Jaccard just under 1) and recall at volume is checkable;
  *   - 5% of documents share a fixed 12-token boilerplate header — a
  *     corpus-common shingle flood that pressures the LSH mega-bucket
  *     guard the way real web boilerplate does;
  *   - the rest is a ~50k-word uniform vocabulary over 40–159 tokens
  *     per document (xxhash64 counter RNG, seeded per (seed, doc, pos):
  *     same args → byte-identical corpus on every run/partitioning).
  *
  * Everything is pure codegen'd column arithmetic on `spark.range` —
  * the generator itself scales to any `nDocs` without a driver path.
  */
object DocGen {

  val Boilerplate: Seq[String] =
    Seq("shared", "site", "header", "terms", "of", "service", "apply",
      "to", "all", "content", "shown", "here")

  def docs(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame = {
    val base = spark.range(0, nDocs).toDF("doc_id")
    // near-dups re-generate the PREDECESSOR's tokens (same src, same RNG
    // stream), then mutate one position
    val src = when(col("doc_id") % 10 === 1, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val len = pmod(xxhash64(lit(seed), src, lit(-1L)), lit(120L)) + lit(40L)
    val toks = transform(sequence(lit(0L), len - 1),
      i => concat(lit("w"), pmod(xxhash64(lit(seed), src, i), lit(50000L))))
    val mutated = transform(toks, (t, i) =>
      when(col("doc_id") % 10 === 1 && i === pmod(col("doc_id"), size(toks)),
        concat(lit("m"), col("doc_id"))).otherwise(t))
    val withHeader = when(col("doc_id") % 100 < 5,
      concat(array(Boilerplate.map(lit): _*), mutated)).otherwise(mutated)
    base.select(col("doc_id"), array_join(withHeader, " ").as("text"))
  }
}
