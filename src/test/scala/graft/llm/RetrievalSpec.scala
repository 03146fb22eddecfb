package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for BM25 ranked retrieval and reciprocal-rank fusion
  * (the oracle gate hash-checks engine ≡ DuckDB; these pin the ranking
  * semantics themselves on planted fixtures).
  */
class RetrievalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val base =
    "spark makes distributed data processing simple and fast for everyone today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                           // exact dup of 0
    (2L, base.replace("simple", "easy")),                 // near dup of 0
    (3L, "completely different words about cooking pasta with tomatoes and basil leaves"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank")
  ).toDF("doc_id", "text")

  test("bm25 ranks self first, exact dup second (id tie-break), near dup third") {
    val out = Retrieval.bm25TopK(docs, docs.filter(col("doc_id") === 0),
        "doc_id", "text", "doc_id", "text", k = 3)
      .orderBy(col("rnk"))
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L),
      s"expected self, dup, near-dup: ${out.mkString(", ")}")
  }

  test("bm25 excludeSelf drops the query document from its own ranking") {
    val out = Retrieval.bm25TopK(docs, docs.filter(col("doc_id") === 0),
        "doc_id", "text", "doc_id", "text", k = 3, excludeSelf = true)
      .collect().map(_.getLong(1)).toSet
    assert(!out.contains(0L) && out.contains(1L))
  }

  test("bm25 rewards rarer terms: a shared rare term outranks a shared common one") {
    val d = Seq(
      (0L, "zebra common"), (1L, "zebra other"), // zebra: df 2
      (2L, "common other"), (3L, "common stuff"), (4L, "common words")
    ).toDF("doc_id", "text") // common: df 4 -> lower idf than zebra
    val out = Retrieval.bm25TopK(d, Seq((9L, "zebra common")).toDF("qid", "qtext"),
        "doc_id", "text", "qid", "qtext", k = 5)
      .orderBy(col("rnk")).collect().map(_.getLong(1))
    assert(out.head == 0L, s"doc with both terms first: ${out.mkString(", ")}")
    assert(out(1) == 1L, s"zebra-only doc must beat common-only docs: ${out.mkString(", ")}")
  }

  test("persisted index: build + append search ≡ from-scratch bm25TopK") {
    import org.apache.spark.sql.functions.{lit, round}
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_lex_spec")
    val name = "graft_lex_spec.bm25_spec"
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx_spec").toString
    Retrieval.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", name, dir)
    Retrieval.appendBm25Shard(spark, name,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("query_id"), col("doc_id"),
          round(col("bm25_raw") + lit(1e-6), 4), col("rnk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val indexed = norm(Retrieval.bm25IndexedTopK(spark, name,
      docs.filter(col("doc_id") < 2), "doc_id", "text", k = 5))
    val scratch = norm(Retrieval.bm25TopK(docs, docs.filter(col("doc_id") < 2),
      "doc_id", "text", "doc_id", "text", k = 5))
    assert(indexed == scratch, s"indexed $indexed\nvs scratch $scratch")
  }

  test("indexed search df re-aggregation is exchange-free on the bucketed table") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.{count, lit, sum}
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_lex_spec")
    val name = "graft_lex_spec.bm25_plan"
    val dir = java.nio.file.Files.createTempDirectory("bm25_plan_spec").toString
    Retrieval.writeBm25Index(docs, "doc_id", "text", name, dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dfAgg = spark.table(s"${name}_df")
        .groupBy(col("token")).agg(sum(col("doc_freq")).as("doc_freq"))
      val exchanges = dfAgg.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed df partials must not shuffle:\n${dfAgg.queryExecution.executedPlan}")
      assert(dfAgg.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rrf fuses ranks: both-list item wins, one-list ties break on id") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rnk")
    val vec = Seq((1L, 10L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rnk")
    val out = Retrieval.rrfFuse(lex, vec, "doc_id", k = 10)
      .orderBy(col("rnk"))
      .collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getInt(5)))
    // 10: 1/61 + 1/61; 11 and 12: 1/62 each -> tie, id order
    assert(out.map(_._1).toSeq == Seq(10L, 11L, 12L), s"got ${out.mkString(", ")}")
    assert(out(0)._2 && out(0)._3, "10 is in both lists")
    assert(out(1)._2 && !out(1)._3, "11 is lex-only")
    assert(!out(2)._2 && out(2)._3, "12 is vec-only")
  }
}
