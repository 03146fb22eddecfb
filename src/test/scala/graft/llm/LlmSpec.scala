package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests on planted fixtures (the oracle gate checks engine ≡
  * DuckDB on real tables; these pin that the algorithms DO what they
  * claim: dups found, non-dups not, bounds hold).
  */
class LlmSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val base =
    "spark makes distributed data processing simple and fast for everyone today"
  private def fixture: DataFrame = Seq(
    (0L, base),
    (1L, base),                                           // exact dup of 0
    (2L, base.replace("simple", "easy")),                 // near dup of 0
    (3L, "completely different words about cooking pasta with tomatoes and basil leaves"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the smallest id and counts copies") {
    val out = Dedup.exact(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2L) // docs 0 and 1 collapse to id 0
    assert(!out.contains(1L))
    assert(out(2L) == 1L && out(3L) == 1L && out(4L) == 1L)
  }

  test("minhash-LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(fixture, "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup must be a candidate with j=1")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "one-word-changed near dup should band-collide")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc matched")
  }

  test("simhash: identical docs at hamming 0; near dups close; pairs found by banding") {
    val pairs = Dedup.simhashPairs(fixture, "doc_id", "text", maxHamming = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) == 0, "identical docs must have hamming 0")
    assert(pairs.get((0L, 2L)).forall(_ <= 8))
  }

  test("char-ngram jaccard near-dup variant finds the planted pair") {
    val pairs = Dedup.ngramJaccardPairs(fixture, "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("language ID picks the marked language; quality score bounded") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "the cat is one of the animals and the dog is another"),
      (1L, "der hund ist gross und die katze ist klein das haus"),
      (2L, "el perro es grande y los gatos que viven en una casa")
    ).toDF("doc_id", "text")
    val langs = docs.select(col("doc_id"),
        TextFunctions.langId(TextFunctions.tokens(col("text"))).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(0L) == "en" && langs(1L) == "de" && langs(2L) == "es")

    val q = fixture.select(TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),  // closest to 0
      (2L, Array(0.0f, 1.0f)),  // orthogonal to 0
      (3L, Array(-1.0f, 0.0f)), // opposite
      (4L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val res = Embeddings.bruteForceTopK(
        emb, emb.filter($"vec_id" === 0L), "vec_id", "embedding", 4)
      .collect().sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    assert(res == Seq(1L, 4L, 2L, 3L), s"got $res")
  }

  test("sign-bucket LSH pairs identical vectors at cosine 1") {
    val emb = Seq(
      (0L, Array(0.5f, 0.5f, -0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f)),
      (1L, Array(0.5f, 0.5f, -0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f)),
      (2L, Array(-0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Embeddings.lshCosinePairs(emb, "vec_id", "embedding", bits = 8, minCosine = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.keySet == Set((0L, 1L)))
    assert(math.abs(pairs((0L, 1L)) - 1.0) < 1e-12)
  }
}
