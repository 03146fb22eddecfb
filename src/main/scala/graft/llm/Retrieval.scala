package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus: Okapi BM25 lexical scoring
  * and reciprocal-rank fusion (RRF) of heterogeneous ranked lists — the
  * lexical half and the fusion step of a hybrid (BM25 + vector) RAG
  * retrieval stack. The vector half is [[Embeddings]]; `llm_hybrid_rrf`
  * composes the two.
  *
  * Scale contract: the query set is the SMALL side (102-106 queries vs a
  * corpus of any size) and is broadcast — the corpus shuffles only as
  * (doc, token) count pairs and per-token aggregates, exactly like
  * [[Corpus.tfidfTopK]]; document bytes never shuffle. The final
  * per-query top-k is a window over candidate rows already cut to
  * query-term matches, so its input is |matching docs| x |query terms|,
  * not the corpus.
  *
  * Reference scope: the reference engine has no retrieval surface; this
  * is part of the beyond-reference LLM-pipeline layer (brief: "similarity
  * search" / training-data curation).
  */
object Retrieval {

  /** Okapi BM25 top-k documents per query.
    *
    * score(q, d) = sum over distinct query terms t of
    *   idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*len(d)/avgdl))
    * with the standard smoothed idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).
    *
    * Cross-engine determinism: `ln` is transcendental (JVM Math.log vs
    * libm log may differ in the last ulp) and the per-(query, doc) sum is
    * order-dependent, so the rank window orders by the score ROUNDED to 4
    * decimals (with the repo's +1e-6 nudge), ties broken by doc id — both
    * engines rank identical keys by construction. `bm25_raw` stays
    * unrounded; gate wrappers round it for the hash compare.
    *
    * Plan shape: one (doc, token) count shuffle; doc length via a window
    * over the doc id; df + corpus stats (N, avgdl) as token-keyed /
    * 1-row aggregates of that same frame; the exploded distinct query
    * terms BROADCAST into the tf frame so only query-term rows survive
    * into the scoring join. A caller issuing many query batches should
    * persist the tf/df frames once (they are corpus-only).
    *
    * Output: (query_id, doc_id named after idCol, bm25_raw, rnk),
    * rnk in [1, k].
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      queryIdCol: String, queryTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    val id = col(idCol)
    val tf = docs
      .select(id, explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(id, col("token"))
      .agg(count(lit(1)).as("tf_count"))
    val withLen = tf.withColumn("__len",
      sum(col("tf_count")).over(Window.partitionBy(id)))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
    // N and avgdl from the per-doc lengths (1 row, broadcast).
    val stats = tf.groupBy(id).agg(sum(col("tf_count")).as("__l"))
      .agg(count(lit(1)).as("__n"), avg(col("__l")).as("__avgdl"))
    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextFunctions.tokens(col(queryTextCol))).as("token"))
      .distinct()
    val idf = ln(lit(1.0) +
      (col("__n") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)))
    val tfNorm = (col("tf_count") * lit(k1 + 1.0)) /
      (col("tf_count") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("__len") / col("__avgdl")))
    val matched0 = withLen
      .join(broadcast(qTerms), Seq("token"))
      .join(docFreq, Seq("token"))
      .crossJoin(broadcast(stats))
    val matched =
      if (excludeSelf) matched0.filter(col("query_id") =!= id) else matched0
    val scored = matched
      .select(col("query_id"), id, (idf * tfNorm).as("__s"))
      .groupBy(col("query_id"), id)
      .agg(sum(col("__s")).as("bm25_raw"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("bm25_raw") + lit(1e-6), 4).desc, id)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), id, col("bm25_raw"), col("rnk"))
  }

  /** Reciprocal-rank fusion of two ranked candidate lists (Cormack et
    * al.'s RRF, the standard hybrid-search combiner): each list
    * contributes 1/(kRrf + rank) for the items it ranked, a full-outer
    * join unions the lists per query, and the fused score re-ranks.
    *
    * RRF is the right fusion for heterogeneous scorers (BM25 vs cosine)
    * because it consumes only RANKS — no score normalization across
    * incomparable scales. Every arithmetic step here is
    * exactly-representable-division and two-term addition in a fixed
    * order, so the fused doubles are bit-identical across engines (no
    * rounding nudge needed for the ORDER; the output is still rounded by
    * gate wrappers for the hash).
    *
    * Inputs must both have columns (query_id, idCol, rnk). Scale shape:
    * the inputs are already per-query top-k lists (bounded: queries x k
    * rows each), so the join and window are tiny regardless of corpus
    * size.
    *
    * Output: (query_id, idCol, in_lex, in_vec, rrf_raw, rnk), rnk in
    * [1, k]; in_lex/in_vec flag which lists ranked the item.
    */
  def rrfFuse(
      lex: DataFrame, vec: DataFrame, idCol: String, k: Int,
      kRrf: Int = 60): DataFrame = {
    def half(df: DataFrame, tag: String): DataFrame =
      df.select(col("query_id"), col(idCol),
        (lit(1.0) / (lit(kRrf.toDouble) + col("rnk"))).as(s"__s_$tag"),
        lit(true).as(s"in_$tag"))
    val fused = half(lex, "lex")
      .join(half(vec, "vec"), Seq("query_id", idCol), "full_outer")
      .select(col("query_id"), col(idCol),
        coalesce(col("in_lex"), lit(false)).as("in_lex"),
        coalesce(col("in_vec"), lit(false)).as("in_vec"),
        (coalesce(col("__s_lex"), lit(0.0)) +
          coalesce(col("__s_vec"), lit(0.0))).as("rrf_raw"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_raw").desc, col(idCol))
    fused
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
