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
    val matched0 = withLen
      .join(broadcast(qTerms), Seq("token"))
      .join(docFreq, Seq("token"))
      .crossJoin(broadcast(stats))
    val matched =
      if (excludeSelf) matched0.filter(col("query_id") =!= id) else matched0
    scoreTopK(matched, idCol, k, k1, b)
  }

  /** The shared BM25 scoring + rank tail: consumes candidate rows
    * carrying (query_id, idCol, tf_count, __len, doc_freq, __n,
    * __avgdl) — used verbatim by both the from-scratch [[bm25TopK]]
    * and the persisted-index [[bm25IndexedTopK]] so the two paths
    * cannot drift.
    */
  private def scoreTopK(
      matched: DataFrame, idCol: String, k: Int,
      k1: Double, b: Double): DataFrame = {
    val id = col(idCol)
    val idf = ln(lit(1.0) +
      (col("__n") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)))
    val tfNorm = (col("tf_count") * lit(k1 + 1.0)) /
      (col("tf_count") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("__len") / col("__avgdl")))
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

  /** Persist the BM25 lexical index — the retrieval twin of the dedup
    * signature index and the IVF index: three catalog tables, ALL
    * append-only, so daily ingest never rewrites anything:
    *
    *   - `<name>_tf` (id, token, tf_count, len): the per-(doc, term)
    *     postings with the document length DENORMALIZED onto each row
    *     (one long per row buys search the right to skip the per-doc
    *     length window entirely);
    *   - `<name>_df` (token, doc_freq): document-frequency PARTIALS,
    *     bucketed by token — each shard appends its own counts and
    *     search re-aggregates, which the bucketing makes exchange-free;
    *   - `<name>_stats` (n_docs, sum_len): one partial row per
    *     build/append; search sums them. Storing the integer SUM (not
    *     avgdl) keeps append exact: n and sum_len add, and
    *     sum_len/n at search equals the from-scratch `avg(len)`
    *     bit-for-bit while total tokens < 2^53 (integer-valued double
    *     accumulation is exact there).
    *
    * Corpus text is tokenized ONCE at build/append; query batches then
    * search without touching it. Id disjointness of appended shards is
    * the caller's contract, as with the other indexes.
    */
  def writeBm25Index(
      docs: DataFrame, idCol: String, textCol: String,
      name: String, pathRoot: String, buckets: Int = 16): Unit = {
    val (tf, dfPart, stats) = indexParts(docs, idCol, textCol)
    tf.write.mode("overwrite").format("parquet")
      .option("path", s"$pathRoot/tf").saveAsTable(s"${name}_tf")
    dfPart.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "token")
      .option("path", s"$pathRoot/df").saveAsTable(s"${name}_df")
    stats.write.mode("overwrite").format("parquet")
      .option("path", s"$pathRoot/stats").saveAsTable(s"${name}_stats")
  }

  /** Daily-ingest append: tokenize only the arriving shard and APPEND
    * its postings, df partials and stats partial — no table is
    * rewritten, no existing row is read. Search over the result is
    * IDENTICAL to a full rebuild (df/stats are additive, postings are
    * per-doc), the property `llm_bm25_indexed`'s gate pins by reusing
    * the from-scratch oracle over the whole corpus.
    */
  def appendBm25Shard(
      spark: org.apache.spark.sql.SparkSession, name: String,
      shard: DataFrame, idCol: String, textCol: String): Unit = {
    val (tf, dfPart, stats) = indexParts(shard, idCol, textCol)
    tf.write.mode("append").format("parquet").insertInto(s"${name}_tf")
    dfPart.write.mode("append").format("parquet").insertInto(s"${name}_df")
    stats.write.mode("append").format("parquet").insertInto(s"${name}_stats")
  }

  private def indexParts(
      docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val id = col(idCol)
    val tf = docs
      .select(id, explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(id, col("token"))
      .agg(count(lit(1)).as("tf_count"))
      .withColumn("len", sum(col("tf_count")).over(Window.partitionBy(id)))
      .select(id.as("id"), col("token"), col("tf_count"), col("len"))
    val dfPart = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
    val stats = tf.groupBy(col("id")).agg(max(col("len")).as("__l"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__l")).as("sum_len"))
    (tf, dfPart, stats)
  }

  /** BM25 search against the persisted index: postings join the
    * broadcast query terms, df partials re-aggregate (exchange-free on
    * the bucketed table), the stats partials sum to one broadcast row —
    * then the SAME [[scoreTopK]] tail as the from-scratch path. Output
    * matches [[bm25TopK]] with the id column named `idCol`.
    */
  def bm25IndexedTopK(
      spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, idCol: String = "doc_id",
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    val tf = spark.table(s"${name}_tf")
      .select(col("id").as(idCol), col("token"), col("tf_count"),
        col("len").as("__len"))
    val docFreq = spark.table(s"${name}_df")
      .groupBy(col("token")).agg(sum(col("doc_freq")).as("doc_freq"))
    val stats = spark.table(s"${name}_stats")
      .agg(sum(col("n_docs")).as("__n"), sum(col("sum_len")).as("__sl"))
      .select(col("__n"),
        (col("__sl").cast("double") / col("__n").cast("double")).as("__avgdl"))
    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextFunctions.tokens(col(queryTextCol))).as("token"))
      .distinct()
    val matched0 = tf
      .join(broadcast(qTerms), Seq("token"))
      .join(docFreq, Seq("token"))
      .crossJoin(broadcast(stats))
    val matched =
      if (excludeSelf) matched0.filter(col("query_id") =!= col(idCol))
      else matched0
    scoreTopK(matched, idCol, k, k1, b)
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
