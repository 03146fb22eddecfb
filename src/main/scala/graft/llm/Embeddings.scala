package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`). All math
  * is double-precision sequential fold over the vector — bit-identical
  * between Spark's `aggregate` HOF and the oracle's `list_sum`, so results
  * hash-compare exactly.
  */
object Embeddings {

  /** Cast to double once; all arithmetic happens in f64. */
  private def d(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for a (small) query set,
    * the ANN baseline. Scale shape: queries are BROADCAST against the
    * corpus scan (no shuffle of the corpus), each task keeps a bounded
    * per-query heap (mapPartitions), and only `tasks x queries x k`
    * candidate rows reach the final (tiny) global top-k — the corpus is
    * never shuffled and nothing unbounded is collected.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus
      .join(broadcast(q), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("__qv"), col(vecCol)).as("sim"))

    // Per-partition bounded top-k (heap), before any shuffle.
    val schema = StructType(Seq(
      StructField("query_id", LongType), StructField("neighbor_id", LongType),
      StructField("sim", DoubleType)))
    implicit val enc = Encoders.row(schema)
    val ord = Ordering.by[(Long, Double), (Double, Long)] {
      case (id, sim) => (-sim, id) // best first: sim desc, id asc
    }
    val pruned = scored.mapPartitions { rows =>
      val heaps = scala.collection.mutable.Map[Long, scala.collection.mutable.PriorityQueue[(Long, Double)]]()
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)) // max-heap on "worst"
        h.enqueue((r.getLong(1), r.getDouble(2)))
        if (h.size > k) h.dequeue() // drop current worst
      }
      heaps.iterator.flatMap { case (q, h) =>
        h.iterator.map { case (id, sim) => Row(q, id, sim) }
      }
    }

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    pruned
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("sim"))
  }

  /** Sign-bit LSH bucket key: the sign pattern of the first `bits`
    * dimensions (axis-aligned random-hyperplane hashing — deterministic
    * and oracle-reproducible; rotate dimensions per table for
    * independence in production).
    */
  def signBucket(vec: Column, bits: Int): Column =
    concat((1 to bits).map { i =>
      when(element_at(vec, i) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Approximate top-k: IVF-style probe of the query's own sign bucket
    * (inverted lists keyed by [[signBucket]]; probe=1). Each query scores
    * only its bucket's candidates — the corpus-side work drops by
    * ~2^bits vs [[bruteForceTopK]], the recall trade of every IVF/LSH
    * ANN index. More probes = also join on neighboring buckets.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, bits: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Multi-probe variant of [[lshTopK]]: each query probes its own sign
    * bucket PLUS every bucket at Hamming distance 1 (bits+1 probes
    * total) — the standard multi-probe LSH recall recovery: a near
    * neighbor differing in exactly one leading sign is found at ~(bits+1)×
    * the single-probe candidate cost instead of being lost. Corpus
    * vectors live in exactly one bucket, so probe buckets are distinct
    * and no (query, neighbor) pair is scored twice. The corpus side
    * still never shuffles: the (still small) exploded query set is
    * broadcast.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, bits: Int, k: Int): DataFrame = {
    val b0 = signBucket(col(vecCol), bits)
    def flip(i: Int): Column = concat(
      substring(b0, 1, i - 1),
      when(substring(b0, i, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(b0, i + 1, bits - i))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(array(b0 +: (1 to bits).map(flip): _*)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Multi-TABLE variant of [[lshTopK]]: `tables` independent hash
    * tables, table t keyed on the sign pattern of dimension slice
    * `[t*bits+1, (t+1)*bits]` (disjoint slices — deterministic and
    * oracle-reproducible; production would use random rotations).
    * Candidates are the DEDUPED union of every table's bucket matches,
    * so a (query, neighbor) pair colliding in several tables is scored
    * once. Recall compounds as 1-(1-p)^T while index size and candidate
    * cost grow ~T× — the standard multi-table LSH trade, and the scale
    * lever when one table's recall isn't enough: the corpus side stays
    * shuffle-free (exploded into T inverted lists, joined against the
    * broadcast exploded query set). Requires `tables*bits <=` dim.
    */
  def lshTopKMultiTable(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, bits: Int, tables: Int, k: Int): DataFrame = {
    // fail fast instead of silently degenerating: out-of-range element_at
    // returns NULL, which would collapse an over-wide table's slice into
    // one constant mega-bucket (quadratic candidates, zero recall gain)
    val dim = queries.select(size(col(vecCol))).head().getInt(0)
    require(tables * bits <= dim,
      s"tables*bits = ${tables * bits} exceeds embedding dim $dim")
    def bucketT(vec: Column, t: Int): Column =
      concat(lit(s"$t:") +: (t * bits + 1 to (t + 1) * bits).map { i =>
        when(element_at(vec, i) >= 0, lit("1")).otherwise(lit("0"))
      }: _*)
    def withBuckets(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        explode(array((0 until tables).map(t => bucketT(col(vecCol), t)): _*)).as("bucket"))
    val q = withBuckets(queries, "query_id", "__qv")
    val c = withBuckets(corpus, "neighbor_id", "__cv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** LSH-bucketed cosine near-duplicate pairs: candidates share a sign
    * bucket (equi-join on the bucket key — never all-pairs), then exact
    * cosine rescoring on candidates only.
    *
    * Two defenses against degenerate bucket distributions (normalized
    * embedding corpora concentrate in few orthants, so unguarded
    * sign-bucketing degrades toward all-pairs):
    *   - `bits` defaults to 12 (≤4096 buckets → finer partitioning; the
    *     recall trade is that a near-dup pair differing in any of the 12
    *     leading signs is missed — raise recall with fewer bits or
    *     multiple rotated tables, at more candidate-pair cost);
    *   - the same mega-bucket guard as `Dedup.lshPairs`: buckets holding
    *     more than `maxBucketSize` vectors are dropped before the
    *     self-join (census + left_semi), bounding the join at
    *     O(buckets × maxBucketSize²) instead of O(bucket²) on the hot
    *     orthant. The DuckDB oracle applies the identical HAVING guard.
    *
    * The bucketed frame is persisted only within this call (feeds the
    * census + both join sides); the materialized result is the one cached
    * handle returned — same scoped caching contract as
    * [[graft.llm.Dedup]]: `unpersist()` the returned frame when done.
    */
  def lshCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      bits: Int = 12, minCosine: Double = 0.2,
      maxBucketSize: Int = 64): DataFrame = {
    val b0 = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
      .persist()
    val keep = b0.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize)
      .select(col("bucket"))
    val b = b0.join(keep, Seq("bucket"), "left_semi")
    graft.llm.Dedup.scoped(
      b.as("a")
        .join(b.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          cosine(col("a.v"), col("b.v")).as("sim"))
        .filter(col("sim") >= lit(minCosine)),
      b0)
  }
}
