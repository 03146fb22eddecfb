package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: dataset mixing
  * needs per-stratum rates (e.g. upsample low-resource languages,
  * downsample crawl boilerplate) that are REPRODUCIBLE — the same row
  * set on every run, engine, partitioning and retry. So membership is a
  * pure function of the row id: a content-hash bucket compared against
  * the stratum's rate. No `rand()` (non-reproducible across retries /
  * partitionings), no `sample()` (same problem).
  *
  * Scale shape: a codegen'd filter — no shuffle, no state; pushes the
  * usual column pruning through and composes with any downstream plan.
  * md5 keeps the bucket oracle-checkable across engines
  * (TextFunctions doc); swap xxhash64 in production if parity is not
  * needed.
  */
object Sampling {

  val Buckets = 10000

  /** Stable bucket in [0, Buckets) from the row id's md5 (first 8 hex
    * digits — same fold as TextFunctions.shingleHashes, so the DuckDB
    * oracle reproduces it digit for digit).
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % Buckets

  /** Weighted corpus mixing: each source frame is sampled at its own
    * rate (hash salted by the source tag, so a row appearing in two
    * sources draws independently) and tagged with `mix_source` — the
    * dataset-mixture step of training-data assembly, as a union of
    * deterministic filters: no shuffle, no state, scan-parallel per
    * source. Schemas must align (unionByName).
    */
  def mix(sources: Seq[(String, DataFrame, Double)], idCol: String): DataFrame =
    sources.map { case (tag, df, rate) =>
      df.filter(
          hashBucket(concat(lit(s"$tag:"), col(idCol).cast("string")))
            < lit(math.round(rate * Buckets)))
        .withColumn("mix_source", lit(tag))
    }.reduce(_.unionByName(_))

  /** Deterministic train/val/test split: each row is assigned to one
    * named split by its hash bucket against cumulative integer
    * thresholds (declaration order; weights sum to 1). Same
    * reproducibility contract as sampling — membership is a pure
    * function of the id, so the split survives reruns, repartitioning
    * and engine swaps, and a row can never land in two splits. Pure
    * projection: no shuffle.
    *
    * The bucket hash is salted with a fixed "split:" tag (same pattern
    * as [[mix]]) so the assignment draws INDEPENDENTLY of any upstream
    * [[stratified]]/[[mix]] filter on the same id — with the unsalted
    * bucket, rows surviving a rate-r sample would all share low buckets
    * and a downstream 80/10/10 split would put every one of them in
    * 'train'.
    */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cums = splits.scanLeft(0L) { case (acc, (_, w)) => acc + math.round(w * Buckets) }.tail
    val b = hashBucket(concat(lit("split:"), col(idCol).cast("string")))
    val first = when(b < lit(cums.head), lit(splits.head._1))
    val chained = splits.tail.init.zip(cums.tail.init).foldLeft(first) {
      case (acc, ((name, _), cum)) => acc.when(b < lit(cum), lit(name))
    }
    df.withColumn("split", chained.otherwise(lit(splits.last._1)))
  }

  /** Keep each row with its stratum's probability (integer
    * per-ten-thousand thresholds, so the comparison is exact — no float
    * boundary). Strata absent from `rates` fall back to `defaultRate`.
    */
  def stratified(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    def threshold(r: Double): Column = lit(math.round(r * Buckets))
    val thr = rates.toSeq.sortBy(_._1).foldLeft(threshold(defaultRate)) {
      case (acc, (k, r)) => when(col(stratumCol) === lit(k), threshold(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < thr)
  }

  /** TOKEN-budget mixture assembly: within each source, keep documents
    * in deterministic hash order until the source's token budget is
    * exhausted — the "100B tokens of web, 20B of code" step that rate-
    * based [[mix]] can't express (rates control DOCUMENT counts; token
    * budgets are what the training run actually consumes).
    *
    * A document is kept iff the cumulative token count of the documents
    * ordered BEFORE it (md5 asc, id tie-break — same reproducibility
    * contract as every sampler here: a pure function of ids, stable
    * under partitioning, retries and engine swaps) is still under the
    * budget; the budget overshoots by at most one document and never
    * undershoots while eligible documents remain. Sources absent from
    * `budgets` fall back to `defaultBudget`.
    *
    * Plan: one window partitioned by the source column — prefix sums
    * scale out across sources exactly like [[Corpus.packChunks]]; the
    * only shuffle is the window's source-keyed exchange, O(rows) with
    * tiny rows (id, source, count, hash).
    *
    * Output: (idCol, sourceCol, n_tokens, tok_before) for kept rows;
    * `tok_before` is the source's token consumption before this doc.
    */
  def tokenBudget(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      budgets: Map[String, Long], defaultBudget: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("budget:"), col(idCol).cast("string")))
    val bud = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget): Column) {
      case (acc, (k, b)) => when(col(sourceCol) === lit(k), lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__h"), col(idCol))
    docs
      .select(col(idCol), col(sourceCol),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"), h.as("__h"))
      .withColumn("tok_before",
        sum(col("n_tokens").cast("long")).over(w) - col("n_tokens"))
      .filter(col("tok_before") < bud)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("tok_before"))
  }

  /** Temperature-balanced source sampling (the mT5/XLM-R α-sampling
    * knob at α = 0.5): target share q_s ∝ √(n_s) — small sources are
    * upweighted relative to their natural share, large ones capped —
    * realized deterministically as "keep the first n_keep docs of each
    * source in md5-rank order", n_keep = min(n_s, ⌊q_s · target⌋).
    *
    * α is FIXED at 0.5 because √ is IEEE-correctly-rounded (deterministic
    * cross-engine) where a general `pow` is not; the one cross-engine
    * hazard left is the Σ√n normalizer's 20-term summation order, which
    * the repo's round-then-floor convention absorbs (both engines floor
    * the identical 6-decimal rounding, so the integer n_keep can't
    * knife-edge). Note the boundary semantics (ADVICE r6): when
    * q·target sits within 1e-6 BELOW an integer, the nudge rounds it up
    * and n_keep is that integer — i.e. the epsilon can shift the kept
    * count by one at exact boundaries, deterministically and on both
    * engines; it does not merely break ties.
    *
    * Scale shape: source counts are a |sources|-row aggregate broadcast
    * back; the md5 rank is one window per source (the same per-source
    * ordering [[tokenBudget]] uses). Returns EVERY doc with its verdict:
    * (idCol, sourceCol, rnk_in_source, n_docs, q_raw, n_keep, keep).
    */
  def temperatureSample(
      docs: DataFrame, idCol: String, sourceCol: String,
      targetDocs: Long): DataFrame = {
    require(targetDocs > 0, s"targetDocs must be positive, got $targetDocs")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(sqrt(col("n_docs").cast("double"))).as("__z"))
    val rated = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"),
        (sqrt(col("n_docs").cast("double")) / col("__z")).as("q_raw"))
      .withColumn("n_keep", least(col("n_docs"),
        floor(round(col("q_raw") * lit(targetDocs.toDouble) + lit(1e-6), 6))
          .cast("long")))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), col(sourceCol))
      .withColumn("rnk_in_source", row_number().over(w))
      .join(broadcast(rated), Seq(sourceCol))
      .withColumn("keep", col("rnk_in_source") <= col("n_keep"))
  }
}
