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

  /** Routes through the codegen'd one-loop kernel
    * ([[graft.plans.DotProduct]], same left-to-right IEEE fold — bit-
    * identical result, oracle splices unchanged) when GraftExtensions
    * is registered (GraftSession always registers); the HOF chain is
    * the fallback for plain sessions.
    */
  def dot(a: Column, b: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(graft.plans.GraftExtensions.registered))
      call_function("graft_dot", a, b)
    else
      aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine with both norms precomputed: the per-PAIR work inside a
    * candidate join drops from three dot products to one — the norms
    * are hoisted to once per VECTOR before the join (each corpus row
    * would otherwise recompute its norm for every query candidate).
    * Bit-identical to [[cosine]]: sqrt/divide run the same IEEE ops on
    * the same inputs wherever they're computed, so the oracle's
    * per-pair formulation hash-matches.
    */
  private def cosineHoisted(a: Column, b: Column, an: Column, bn: Column): Column =
    dot(a, b) / (an * bn)

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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val scored = corpus
      .withColumn("__cn", norm(col(vecCol)))
      .join(broadcast(q), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosineHoisted(col("__qv"), col(vecCol), col("__qn"), col("__cn")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Bounded per-query top-k over a scored candidate stream — the
    * shuffle-taming half of [[bruteForceTopK]], shared with
    * [[graft.llm.Quantization.pqTopK]]'s ADC shortlist. Contract:
    * `scored` has exactly (query_id: long, neighbor_id: long,
    * sim: double), best = highest sim, ties to the smaller
    * neighbor_id. Each task keeps a bounded per-query heap
    * (mapPartitions) BEFORE any exchange, so only
    * `tasks x queries x k` rows reach the final (tiny) global window —
    * the candidate stream itself is never shuffled.
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
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

  /** Shared seed for the default hyperplane family: every engine-side
    * bucket and every generated oracle SQL splice weights from the same
    * (seed, table, bit, dim) function, so both engines hash the corpus
    * into identical buckets.
    */
  val DefaultSeed = 42L

  /** splitmix64 finalizer — a full-avalanche integer mix, so weights for
    * adjacent (table, bit, dim) indices are decorrelated. Pure integer
    * arithmetic: bit-identical on every JVM.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic ±1 weight of dimension `i` of hyperplane `bit` of
    * hash table `table`: the low bit of a splitmix64 mix of the indices.
    * Signed-sum random projections use the WHOLE vector for every bit
    * (vs the old axis-aligned sign buckets that wasted the hash on a few
    * raw dimensions — normalized corpora concentrate in few orthants, so
    * axis buckets were badly unbalanced; measured recall@3 went from
    * 0.39 to 0.93 on the sf0.01 embeddings at equal candidate budget).
    */
  def planeWeight(seed: Long, table: Int, bit: Int, i: Int): Int =
    if ((mix64(seed ^ (table.toLong << 40) ^ (bit.toLong << 20) ^ i.toLong) & 1L) == 0L) 1 else -1

  /** The `dim` weights of one hyperplane, for splicing into oracle SQL. */
  def planeWeights(seed: Long, table: Int, bit: Int, dim: Int): Array[Int] =
    Array.tabulate(dim)(i => planeWeight(seed, table, bit, i))

  /** Random-hyperplane LSH bucket key: bit b is the sign of the vector's
    * projection onto a seeded ±1 hyperplane (SimHash for vectors,
    * Charikar 2002). Weights are plan-time constants: the fold below is
    * the same double-precision sequential sum as [[dot]], so the oracle
    * reproduces buckets exactly from the same literal weights.
    */
  def projBucket(vec: Column, dim: Int, bits: Int, table: Int = 0,
      seed: Long = DefaultSeed): Column =
    concat((0 until bits).map { b =>
      val w = array(planeWeights(seed, table, b, dim).map(x => lit(x.toDouble)): _*)
      when(dot(vec, w) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** [[projBucket]] namespaced per table ("t:bits") so multi-table
    * inverted lists never cross-match.
    */
  def projBucketPrefixed(vec: Column, dim: Int, bits: Int, table: Int,
      seed: Long = DefaultSeed): Column =
    concat(lit(s"$table:"), projBucket(vec, dim, bits, table, seed))

  /** Nearest-centroid assignment — the IVF-TRAINING / cluster-curation
    * primitive: each corpus vector goes to its highest-cosine centroid,
    * ties to the smallest centroid id. The output (vector → cluster,
    * similarity) is what cluster-balanced sampling, per-cluster caps
    * and learned-IVF inverted lists consume; iterate mean-per-cluster →
    * reassign for Lloyd's k-means.
    *
    * Scale shape: the (small) centroid frame is BROADCAST against the
    * corpus scan, and the per-vector argmax is ONE aggregation of the
    * k×corpus scored rows — `max(struct(sim, -centroid_id))` collapses
    * map-side, so the exchange moves one row per vector, and the corpus
    * itself never shuffles. Norms are hoisted once per side (1 dot per
    * (vector, centroid) pair).
    */
  /** Prototype-proximity pruning (SSL-prototypes / SemDeDup-style data
    * curation): assign each vector to its nearest centroid, rank WITHIN
    * each cluster by similarity to the centroid (most prototypical
    * first), and flag the top `pruneFrac` of every cluster for removal —
    * the "too easy / redundant near the prototype" examples that
    * data-pruning work drops first, keeping the cluster's harder tail.
    *
    * Cross-engine determinism: rank orders by the similarity ROUNDED to
    * 6 decimals (+1e-6 nudge), ties to the smaller vector id — the sim
    * doubles are bit-identical across engines (sequential-fold dot), but
    * the rounded key keeps the rank stable under any future kernel that
    * isn't. The per-cluster keep threshold uses integer arithmetic on
    * the rank (`rnk > ceil(frac * n)` via `rnk * denom > num * n` with
    * `pruneFrac = num/denom` rational) so no float comparison decides
    * membership.
    *
    * Scale shape: [[assignClusters]]'s broadcast-and-argmax (corpus
    * never shuffles) plus ONE window partitioned by cluster id — state
    * per partition is a row counter; skewed clusters parallelize no
    * worse than their size, which is the operator's semantics.
    *
    * Output: (idCol, cluster_id, sim, rnk, n_in_cluster, keep).
    */
  def prototypePrune(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      pruneNum: Int, pruneDenom: Int): DataFrame = {
    require(pruneNum >= 0 && pruneDenom > 0 && pruneNum <= pruneDenom,
      s"pruneFrac must be a rational in [0, 1], got $pruneNum/$pruneDenom")
    val assigned = assignClusters(corpus, centroids, idCol, vecCol)
    val byCluster = Window.partitionBy(col("cluster_id"))
    val w = byCluster.orderBy(
      round(col("sim") + lit(1e-6), 6).desc, col(idCol))
    assigned
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_in_cluster", count(lit(1)).over(byCluster))
      // keep iff rnk > frac * n  <=>  rnk * denom > num * n (exact in
      // longs) — floor(frac * n) most-prototypical rows are pruned
      .withColumn("keep",
        col("rnk").cast("long") * lit(pruneDenom.toLong) >
          lit(pruneNum.toLong) * col("n_in_cluster"))
  }

  def assignClusters(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val c = centroids.select(col(idCol).as("centroid_id"),
      col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
    val best = corpus
      .select(col(idCol), col(vecCol), norm(col(vecCol)).as("__vn"))
      .crossJoin(broadcast(c))
      .select(col(idCol),
        struct(
          cosineHoisted(col(vecCol), col("__cv"), col("__vn"), col("__cn")).as("sim"),
          (lit(0L) - col("centroid_id")).as("nid")).as("__s"))
      .groupBy(col(idCol))
      .agg(max(col("__s")).as("m"))
    best.select(col(idCol),
      (lit(0L) - col("m.nid")).as("cluster_id"),
      col("m.sim").as("sim"))
  }

  /** The Lloyd UPDATE step paired with [[assignClusters]]: per-cluster
    * component means in long form `(cluster_id, pos, mean)` — explode
    * each assigned vector into (component, value) rows and average per
    * (cluster, component). Long form keeps the shuffle key small and
    * the output engine-comparable; pivot back to `array` with
    * `collect_list` over a position sort when feeding the next
    * [[assignClusters]] round. Scale shape: one explode (dim× row
    * inflation, map-local) into one partially-aggregated groupBy —
    * state is clusters × dim cells, independent of corpus size.
    */
  def centroidUpdate(
      assigned: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol), col(vecCol))
      .join(assigned.select(col(idCol), col("cluster_id")), Seq(idCol))
      .select(col("cluster_id"), posexplode(d(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col("cluster_id"), col("pos"))
      .agg(avg(col("v")).as("mean"))

  /** Pivot [[centroidUpdate]]'s long form `(cluster_id, pos, mean)` back
    * to the array form [[assignClusters]] consumes: one row per
    * centroid, components ordered by `pos`. `array_sort` over
    * `(pos, mean)` structs orders by `pos` first (struct field order),
    * so the rebuilt vector is positional regardless of shuffle order.
    * Callers quantize the means first (`round(mean + 1e-6, 4) + 0.0`,
    * the repo's rounding convention) when the centroids must be
    * byte-equal across engines — the handoff that makes a multi-round
    * Lloyd loop oracle-replayable: each iteration's input centroids are
    * the ROUNDED previous means, so cross-engine summation-order ulps
    * never compound across iterations.
    */
  def centroidsFromMeans(means: DataFrame, idCol: String, vecCol: String): DataFrame =
    means.groupBy(col("cluster_id").as(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean")))),
        x => x.getField("mean")).as(vecCol))

  /** Learned-IVF approximate top-k: corpus vectors live in the inverted
    * list of their nearest centroid ([[assignClusters]] — at production
    * scale this assignment is the persisted index, built once per
    * codebook); each query probes its `nprobe` highest-cosine cells and
    * scores only those lists. Candidate cost is ~nprobe/k-cells of the
    * corpus per query — the IVF recall/cost dial — and unlike the
    * hyperplane buckets of [[lshTopK]], the cells ADAPT to the corpus
    * distribution (centroids from [[centroidUpdate]] rounds), which is
    * what keeps lists balanced when the data is clustered rather than
    * isotropic.
    *
    * Scale shape: centroids and the (small) probe set are BROADCAST;
    * the corpus is scanned once for assignment (one map-side-combined
    * agg row per vector) and once for scoring, and never shuffled by
    * the join. Per-query result is bounded by the window top-k.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    val lists = assignClusters(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("cluster_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
      .join(lists, Seq("neighbor_id"))
    val cent = centroids.select(col(idCol).as("centroid_id"),
      col(vecCol).as("__ce"), norm(col(vecCol)).as("__cen"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("__qv"), col("__qn"), col("centroid_id"),
        cosineHoisted(col("__qv"), col("__ce"), col("__qn"), col("__cen")).as("csim"))
      .withColumn("prnk", row_number().over(wp))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("centroid_id").as("cluster_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineHoisted(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Persist an IVF index as catalog tables — the ANN twin of
    * [[graft.llm.Dedup.writeBandedIndex]]'s daily-ingest story:
    *
    *   - `<name>_lists(id, vec, nrm, cluster_id)` bucketed by
    *     `cluster_id`: the inverted lists, with the per-vector norm
    *     PRECOMPUTED so search never rescans or re-normalizes the
    *     corpus.
    *   - `<name>_centroids(centroid_id, cv)`: the (tiny) codebook the
    *     router broadcasts.
    *
    * What persisting buys at corpus scale: [[ivfTopK]] re-runs the
    * assignment pass — k×dim flops per corpus row plus an argmax
    * aggregate — on EVERY search batch; here that pass runs once at
    * build time, and each search only streams the probed lists against
    * a broadcast probe set (no corpus shuffle, no assignment, no norm
    * recompute). Tables are EXTERNAL (explicit `path`) for the same
    * restart-safety reason as the dedup index: rebuild-into-place must
    * survive a JVM whose warehouse dir outlives the catalog.
    */
  def writeIvfIndex(
      corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      name: String, pathRoot: String, buckets: Int = 16): Unit = {
    val spark = corpus.sparkSession
    assignClusters(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("cluster_id"))
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        norm(col(vecCol)).as("nrm"), col("cluster_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "cluster_id")
      .option("path", s"$pathRoot/lists")
      .saveAsTable(s"${name}_lists")
    centroids
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cnrm"))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$pathRoot/centroids")
      .saveAsTable(s"${name}_centroids")
  }

  /** Daily-ingest append: route a NEW shard of vectors to the existing
    * codebook and add them to the persisted inverted lists — the
    * arriving shard is assigned (broadcast centroids, no index read)
    * and inserted bucket-aligned; the index itself is never rewritten
    * or reshuffled. Search over the result is IDENTICAL to a full
    * rebuild because assignment depends only on the (frozen) centroids,
    * never on which other vectors share the list — the property the
    * `llm_emb_index_incremental` gate pins by reusing the from-scratch
    * oracle. Id disjointness from the indexed corpus is the caller's
    * contract, as with the dedup index.
    */
  def appendIvfShard(
      spark: org.apache.spark.sql.SparkSession, name: String,
      shard: DataFrame, idCol: String, vecCol: String): Unit = {
    val cent = spark.table(s"${name}_centroids")
      .select(col("centroid_id").as(idCol), col("cv").as(vecCol))
    assignClusters(shard, cent, idCol, vecCol)
      .select(col(idCol), col("cluster_id"))
      .join(shard.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        norm(col(vecCol)).as("nrm"), col("cluster_id"))
      .write.mode("append").format("parquet")
      .insertInto(s"${name}_lists")
  }

  /** Search a [[writeIvfIndex]] layout: identical routing and scoring
    * to [[ivfTopK]] (same probes, same tie order — result-identical
    * given the same centroids and lists), minus the per-search
    * assignment pass. The probe set (queries × nprobe cells) is
    * broadcast against the bucketed list scan; per-query results are
    * bounded by the window top-k, so the only exchange moves scored
    * candidates, never the index.
    */
  def ivfIndexedTopK(
      spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val cent = spark.table(s"${name}_centroids")
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("__qv"), col("__qn"), col("centroid_id"),
        cosineHoisted(col("__qv"), col("cv"), col("__qn"), col("cnrm")).as("csim"))
      .withColumn("prnk", row_number().over(wp))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("centroid_id").as("cluster_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    spark.table(s"${name}_lists")
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosineHoisted(col("__qv"), col("vec"), col("__qn"), col("nrm")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Approximate top-k: IVF-style probe of the query's own projection
    * bucket (inverted lists keyed by [[projBucket]]; probe=1). Each query
    * scores only its bucket's candidates — the corpus-side work drops by
    * ~2^bits vs [[bruteForceTopK]], the recall trade of every IVF/LSH
    * ANN index. More probes = also join on neighboring buckets. Size
    * `bits` with the corpus: ~log2(n / targetBucketSize).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, bits: Int, k: Int,
      seed: Long = DefaultSeed): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"),
      projBucket(col(vecCol), dim, bits, 0, seed).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"),
      projBucket(col(vecCol), dim, bits, 0, seed).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineHoisted(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Multi-probe variant of [[lshTopK]]: each query probes its own
    * bucket PLUS every bucket at Hamming distance 1 (bits+1 probes
    * total) — the standard multi-probe LSH recall recovery: a near
    * neighbor differing in exactly one projection sign is found at ~(bits+1)×
    * the single-probe candidate cost instead of being lost. Corpus
    * vectors live in exactly one bucket, so probe buckets are distinct
    * and no (query, neighbor) pair is scored twice. The corpus side
    * still never shuffles: the (still small) exploded query set is
    * broadcast.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, bits: Int, k: Int,
      seed: Long = DefaultSeed): DataFrame = {
    val b0 = projBucket(col(vecCol), dim, bits, 0, seed)
    def flip(i: Int): Column = concat(
      substring(b0, 1, i - 1),
      when(substring(b0, i, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(b0, i + 1, bits - i))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"),
      explode(array(b0 +: (1 to bits).map(flip): _*)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"),
      projBucket(col(vecCol), dim, bits, 0, seed).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineHoisted(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Multi-TABLE variant of [[lshTopK]]: `tables` independent hash
    * tables, table t keyed on `bits` seeded random-projection signs
    * (disjoint (seed, table) weight families — deterministic and
    * oracle-reproducible, each plane spanning ALL `dim` dimensions, so
    * any number of tables composes regardless of dim).
    * Candidates are the DEDUPED union of every table's bucket matches,
    * so a (query, neighbor) pair colliding in several tables is scored
    * once. Recall compounds as 1-(1-p)^T while index size and candidate
    * cost grow ~T× — the standard multi-table LSH trade, and the scale
    * lever when one table's recall isn't enough: the corpus side stays
    * shuffle-free (exploded into T inverted lists, joined against the
    * broadcast exploded query set).
    */
  def lshTopKMultiTable(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, bits: Int, tables: Int, k: Int,
      seed: Long = DefaultSeed): DataFrame = {
    def withBuckets(df: DataFrame, id: String, v: String, n: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        norm(col(vecCol)).as(n),
        explode(array((0 until tables)
          .map(t => projBucketPrefixed(col(vecCol), dim, bits, t, seed)): _*)).as("bucket"))
    val q = withBuckets(queries, "query_id", "__qv", "__qn")
    val c = withBuckets(corpus, "neighbor_id", "__cv", "__cn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineHoisted(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** LSH-bucketed cosine near-duplicate pairs: candidates share a sign
    * bucket (equi-join on the bucket key — never all-pairs), then exact
    * cosine rescoring on candidates only.
    *
    * Two defenses against degenerate bucket distributions (exact-copy
    * floods land every duplicate in one bucket under ANY hash family;
    * random projections fix the benign orthant skew but not adversarial
    * identical content):
    *   - `bits` defaults to 12 (≤4096 buckets → finer partitioning; the
    *     recall trade is that a near-dup pair differing in any of the 12
    *     projection signs is missed — raise recall with fewer bits or
    *     multiple seeded tables, at more candidate-pair cost);
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
    *
    * EAGER: runs a Spark job and returns a persisted handle —
    * downstream filters do NOT push into the pair computation.
    */
  def lshCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      bits: Int = 12, minCosine: Double = 0.2,
      maxBucketSize: Int = 64, seed: Long = DefaultSeed): DataFrame = {
    val b0 = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("n"),
      projBucket(col(vecCol), dim, bits, 0, seed).as("bucket"))
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
          cosineHoisted(col("a.v"), col("b.v"), col("a.n"), col("b.n")).as("sim"))
        .filter(col("sim") >= lit(minCosine)),
      b0)
  }
}
