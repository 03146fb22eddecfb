package graft.streaming

import graft.llm.Embeddings
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface of the ANN ingest path: embedding
  * vectors arrive as an unbounded stream and are screened against a
  * PERSISTED IVF index ([[graft.llm.Embeddings.writeIvfIndex]]) for
  * semantic near-duplicates — the embedding-space twin of
  * [[DocsStream.indexScreen]]'s MinHash screen, and the streaming twin
  * of [[graft.llm.Embeddings.ivfIndexedTopK]].
  *
  * Like the MinHash screen this is a PURE stateless plan — no
  * watermark, no state store — so each vector's verdict depends only on
  * itself and the frozen index, making the output batching-invariant
  * and oracle-checkable. The wrinkle vs. the text screen: IVF routing
  * needs a per-query argmax over the codebook, and ranking windows are
  * not allowed on streams. The codebook is tiny by construction, so the
  * argmax moves INTO the row: the centroid table is collapsed to a
  * single array-of-structs row, stream-static-joined on a constant key
  * (a one-row build side), and each vector selects its `nprobe` cells
  * with an `array_sort` over that array — pure projection, no window,
  * no state.
  */
object EmbStream {

  /** Schema of the driver's embeddings table (TESTDATA.md). */
  val embSchema = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"

  /** Unbounded stream of embedding rows from a growing parquet dir. */
  def readEmbeddings(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(embSchema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  /** Screen streamed vectors against a persisted IVF index: route each
    * vector to its `nprobe` nearest cells (in-row argsort of the
    * broadcast-small codebook — identical cell choice and tie order,
    * `sim desc, centroid_id`, as [[graft.llm.Embeddings.ivfIndexedTopK]]'s
    * rank-window routing), stream-static equi-join the bucketed
    * inverted lists on `cluster_id`, and emit one row per
    * `(vector, index neighbor)` with cosine ≥ `minCos`.
    *
    * Scale shape: the only joins are stream-static — a one-row
    * broadcast (codebook array) and the cell equi-join into the
    * parquet-backed lists — so throughput is bounded by the shard
    * side's `nprobe/cells` slice of the index scan; the index never
    * shuffles and the stream holds no state. Cell membership of an
    * index vector depends only on the frozen codebook, so the screen
    * cannot emit a neighbor twice (each neighbor lives in exactly one
    * list) and micro-batch boundaries cannot change any verdict.
    *
    * CONTRACT (as [[DocsStream.indexScreen]]): streamed ids must be
    * disjoint from index ids; self-pairs are dropped defensively.
    */
  def annScreen(
      spark: SparkSession, name: String, stream: DataFrame,
      idCol: String, vecCol: String,
      nprobe: Int, minCos: Double): DataFrame = {
    val codebook = spark.table(s"${name}_centroids")
      .agg(collect_list(struct(col("centroid_id"), col("cv"), col("cnrm")))
        .as("__cents"))
      .withColumn("__k", lit(1))
    def cos(a: Column, b: Column, an: Column, bn: Column): Column =
      Embeddings.dot(a, b) / (an * bn)
    val probed = stream
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", Embeddings.norm(col("__qv")))
      .withColumn("__k", lit(1))
      .join(codebook, Seq("__k"))
      // negated sim: array_sort's (field1 asc, field2 asc) order is
      // exactly (sim desc, centroid_id asc) — the index search's tie
      // order — without a comparator lambda.
      .withColumn("__scored", transform(col("__cents"), c =>
        struct((lit(0.0) - cos(col("__qv"), c.getField("cv"),
            col("__qn"), c.getField("cnrm"))).as("negsim"),
          c.getField("centroid_id").as("cid"))))
      .withColumn("__probes", slice(array_sort(col("__scored")), 1, nprobe))
      .select(col("query_id"), col("__qv"), col("__qn"),
        explode(col("__probes.cid")).as("cluster_id"))
    probed
      .join(spark.table(s"${name}_lists"), Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cos(col("__qv"), col("vec"), col("__qn"), col("nrm")).as("sim"))
      .filter(col("sim") >= lit(minCos))
  }
}
