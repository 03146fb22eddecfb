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

  test("incremental shard-vs-index dedup ≡ from-scratch pairs touching the shard") {
    import org.apache.spark.sql.functions.{col, round, lit}
    // corpus = even ids, shard = odd ids; 1 (exact dup of 0) and the
    // near-dup 2↔0 relation cross the corpus/shard boundary
    val corpus = fixture.filter(col("doc_id") % 2 === 0)
    val shard = fixture.filter(col("doc_id") % 2 === 1)
    val idxDir = java.nio.file.Files.createTempDirectory("sig_index_spec").toString
    Dedup.signatureIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxDir)
    val index = spark.read.parquet(idxDir)

    def norm(df: DataFrame): Set[(Long, Long, Double)] = df
      .select(col("id_a"), col("id_b"), round(col("jaccard") + lit(1e-6), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val incremental = Dedup.incrementalPairs(index, shard, "doc_id", "text",
      minJaccard = 0.4)
    val scratch = Dedup.minhashPairs(fixture, "doc_id", "text", minJaccard = 0.4)
    val scratchShardTouching = norm(
      scratch.filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1))
    assert(norm(incremental) == scratchShardTouching,
      "incremental pairs diverged from the from-scratch recompute")
    // and it actually found the planted cross-boundary dup
    assert(norm(incremental).exists { case (a, b, _) => (a, b) == ((0L, 1L)) })
    // no corpus×corpus pair leaks into the increment
    assert(!norm(incremental).exists { case (a, b, _) => a % 2 == 0 && b % 2 == 0 })
    // THE plan property that makes the operator incremental: corpus
    // documents enter the plan ONLY through the parquet index relation —
    // every text-shingling branch descends from the shard filter
    // (doc_id % 2 = 1); no corpus-side (doc_id % 2 = 0) branch exists
    // anywhere, so corpus text is never re-read or re-tokenized. (The
    // analyzed plan retains the pre-cache tree; the shard's shingle
    // subtree legitimately repeats across join/census branches.)
    val analyzed = incremental.queryExecution.analyzed.toString
    assert(analyzed.contains("] parquet"), s"index parquet read missing:\n$analyzed")
    assert(analyzed.contains("= cast(1 as bigint))"), s"shard filter missing:\n$analyzed")
    assert(!analyzed.contains("= cast(0 as bigint))"),
      s"a corpus-side branch leaked into the incremental plan:\n$analyzed")

    // the ingest ACTION: doc 1 (exact dup of indexed doc 0) is dropped,
    // the genuinely-new shard docs survive
    val kept = Dedup.ingestFilter(index, shard, "doc_id", "text", minJaccard = 0.4)
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(1L), "dup of an indexed doc must be dropped")
    assert(keptIds.contains(3L), "novel shard doc must survive")

    // crash-recovery REPLAY: re-ingesting a shard whose ids are already
    // in the index must ingest nothing (idempotence via the id guard —
    // a doc can't LSH-pair with its own indexed copy)
    val fullIdxDir = java.nio.file.Files.createTempDirectory("sig_index_replay").toString
    Dedup.signatureIndex(fixture, "doc_id", "text")
      .write.mode("overwrite").parquet(fullIdxDir)
    val replay = Dedup.ingestFilter(
      spark.read.parquet(fullIdxDir), shard, "doc_id", "text", minJaccard = 0.4)
    assert(replay.count() == 0, "replayed shard must not re-ingest")
    replay.unpersist(); kept.unpersist(); incremental.unpersist(); scratch.unpersist()
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

  test("scrubSpans excises exactly the contaminated windows and keeps the rest") {
    import org.apache.spark.sql.functions.col
    val evalText = "alpha beta gamma delta"  // a 4-gram eval snippet
    val corpus = Seq(
      // eval 4-gram quoted mid-document: tokens 2..5 must go, rest stays
      (0L, s"intro words $evalText closing words here"),
      // clean document: untouched, n_removed 0
      (1L, "totally unrelated text with no overlap whatsoever at all"),
      // two overlapping hits (eval gram at 0 and at 1 via repeat) merge
      (2L, s"alpha beta gamma delta extra")
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val out = Decontamination.scrubSpans(corpus, evalDocs, "doc_id", "text", n = 4)
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(rows(0L) == (("intro words closing words here", 4)), rows(0L))
    assert(rows(1L) == (("totally unrelated text with no overlap whatsoever at all", 0)))
    assert(rows(2L) == (("extra", 4)), rows(2L))
    assert(out.count() == 3, "every corpus document must come back")
    // the hit detection rides the native codegen'd Bloom probe, no UDF
    val analyzed = out.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_bloom_might_contain"), analyzed)
    assert(!analyzed.contains("UDF("), s"ScalaUDF leaked:\n$analyzed")
    out.unpersist()
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

  test("repetition metrics flag looped text and pass prose") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "spam spam spam spam spam spam spam spam spam spam"),        // one token dominates
      (1L, "buy now buy now buy now buy now buy now buy now"),          // looped bigram
      (2L, "each word here appears exactly once across the whole text")  // clean prose
    ).toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val m = docs.select(col("doc_id"),
        TextFunctions.topTokenFraction(toks).as("top"),
        TextFunctions.dupBigramFraction(toks).as("dup"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(0L)._1 == 1.0, "all-same-token doc must score top_frac 1")
    assert(m(1L)._2 > 0.8, s"looped bigrams must score high dup fraction: ${m(1L)}")
    assert(m(2L)._1 < 0.2 && m(2L)._2 == 0.0, s"clean prose must pass: ${m(2L)}")
  }

  test("topTokenFraction is linear: a 100k-token near-unique document finishes in seconds") {
    import org.apache.spark.sql.functions.col
    // ~unique vocabulary is the worst case for the old
    // O(distinct × tokens) form (~10^10 comparisons in ONE row — a
    // straggler task that stalls a full quality pass); the sorted-run
    // fold must stay O(n log n). One planted token appears 7 times.
    val n = 100000
    val text = ((0 until n - 7).map(i => s"tok$i") ++ Seq.fill(7)("planted"))
      .mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = docs.select(
        TextFunctions.topTokenFraction(TextFunctions.tokens(col("text"))).as("top"))
      .collect().head.getDouble(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(math.abs(out - 7.0 / n) < 1e-12, s"max multiplicity must be the planted 7: $out")
    assert(secs < 20, f"long-document quality metric took $secs%.1f s — not linear")
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

  test("simhash mega-bucket guard: degenerate corpus produces no pair explosion") {
    // 200 identical docs land every copy in the same lo/hi band buckets
    // (size 200 > 64): unguarded, the self-join would emit 19,900 flood
    // pairs; the guard drops the mega buckets while the two unique near
    // dups (bucket size <= 2) still pair up.
    val flood = (0L until 200L).map(i => (i, "common boilerplate text repeated across the whole corpus body"))
    // Exact-dup planted pair: identical docs share BOTH 16-bit halves
    // (guaranteed candidate at hamming 0), while a one-token edit may
    // flip bits in both halves and legitimately miss the banding.
    val planted = Seq(
      (900L, "a genuinely unique sentence about glaciers calving into arctic fjords"),
      (901L, "a genuinely unique sentence about glaciers calving into arctic fjords"))
    val docs = (flood ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 < 200L || p._2 < 200L),
      s"mega-bucket flood pairs leaked: ${pairs.size} pairs")
    assert(pairs == Set((900L, 901L)), s"planted near-dup lost: $pairs")
  }

  test("salted hot buckets bound adversarial floods while keeping partial signal") {
    // 200 identical docs = one flood bucket per band (every pair IS a
    // true dup). Drop policy finds none of them; salt policy must find
    // SOME (same-salt-group pairs) but far fewer than the quadratic
    // 19,900, and the unique planted pair survives under both policies.
    val flood = (0L until 200L).map(i =>
      (i, "common boilerplate text repeated across the whole corpus body"))
    val planted = Seq(
      (900L, "a genuinely unique sentence about glaciers calving into arctic fjords"),
      (901L, "a genuinely unique sentence about glaciers calving into arctic fjords"))
    val docs = (flood ++ planted).toDF("doc_id", "text")
    val dropped = Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped == Set((900L, 901L)), "drop policy zeroes the flood")
    val salted = Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.9,
        saltHotBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted.contains((900L, 901L)), "planted pair must survive salting")
    val floodPairs = salted.count(p => p._1 < 200L && p._2 < 200L)
    assert(floodPairs > 0, "salting must retain some same-group flood pairs")
    assert(floodPairs < 8000,
      s"per-bucket work must stay ~n*maxBucketSize, got $floodPairs pairs")
    // benign corpus: no hot buckets -> the two policies are identical
    val a = Dedup.minhashPairs(fixture, "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.minhashPairs(fixture, "doc_id", "text", minJaccard = 0.4,
        saltHotBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "policies must agree when no bucket is hot")
  }

  test("embedding mega-bucket guard: an exact-copy flood produces no pair explosion") {
    // 200 copies of ONE vector land in one bucket under ANY hash family
    // (the adversarial duplicate flood random projections can NOT
    // disperse, unlike r4's benign hot-orthant skew which they fix);
    // guarded (bucket 200 > 64 dropped), the flood contributes zero
    // pairs, while a planted near-identical pair — positive scaling, so
    // provably the same projection signs — survives in its own bucket.
    val rnd = new scala.util.Random(42)
    val base = Array.fill(12)(0.1f + rnd.nextFloat())
    val flood = (0L until 200L).map(i => (i, base))
    val v = Array.fill(12)(-0.5f - rnd.nextFloat())
    val planted = Seq((900L, v), (901L, v.map(x => x * 1.01f)))
    val emb = (flood ++ planted).toDF("vec_id", "embedding")
    val pairs = Embeddings.lshCosinePairs(emb, "vec_id", "embedding", dim = 12, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 < 200L || p._2 < 200L),
      s"duplicate-flood pairs leaked: ${pairs.size} pairs")
    assert(pairs == Set((900L, 901L)), s"planted near-dup lost: $pairs")
  }

  test("near-dup clusters: min-label propagation resolves chains and singletons") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1-2-3 (transitive: 1 and 3 never paired directly), pair 8-9
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L,
      "chain must collapse to the min id transitively")
    assert(out(8L) == 8L && out(9L) == 8L)
    assert(Seq(4L, 5L, 6L, 7L, 10L).forall(i => out(i) == i), "singletons keep their id")
    assert(out.size == 10)
    // the fixture corpus end-to-end: docs 0/1 exact dups + 2 near dup
    val full = Dedup.nearDupClusters(fixture, "doc_id",
        Dedup.minhashPairs(fixture, "doc_id", "text", minJaccard = 0.4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full(0L) == 0L && full(1L) == 0L && full(2L) == 0L)
    assert(full(3L) == 3L && full(4L) == 4L)
  }

  test("pair producers leave only the returned frame cached (scoped caches, ADVICE r3)") {
    import org.apache.spark.storage.StorageLevel
    // Set-difference, not absolute counts: earlier tests' localCheckpoint
    // blocks linger in getPersistentRDDs until the ContextCleaner GCs them.
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Dedup.minhashPairs(fixture, "doc_id", "text", minJaccard = 0.4)
    assert(pairs.storageLevel != StorageLevel.NONE, "result frame should come back cached")
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.size == 1,
      s"intermediate LSH caches (signatures, band keys) must be released on return; found $fresh")
    pairs.unpersist(blocking = true)
    val left = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(left.isEmpty, s"unpersisting the returned handle must leave nothing cached: $left")
  }

  test("clusters converge logarithmically on a 300-node chain (ADVICE r3)") {
    // A path graph is the worst case for plain min-label propagation
    // (O(diameter) rounds — the old 50-round cap would silently return
    // wrong labels for this 299-hop chain). Pointer jumping must resolve
    // it in ~log2(300)+1 rounds, and every node must reach label 0.
    val n = 300L
    val docs = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (out, rounds) = Dedup.nearDupClustersWithRounds(docs, "doc_id", pairs)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 300 && labels.values.forall(_ == 0L),
      s"chain must collapse to cluster 0; distinct labels: ${labels.values.toSet.size}")
    assert(rounds <= 13, s"expected O(log diameter) convergence, took $rounds rounds")
  }

  test("keepBest emits one decision row per cluster with member counts") {
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.keepBest(fixture, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 3, s"clusters {0,1,2}, {3}, {4} -> 3 rows, got ${out.toSeq}")
    val byCluster = out.map(t => t._1 -> t).toMap
    assert(byCluster(0L)._3 == 3L, "merged cluster has 3 members")
    assert(Set(0L, 1L, 2L).contains(byCluster(0L)._2))
    assert(byCluster(3L) == ((3L, 3L, 1L)) && byCluster(4L) == ((4L, 4L, 1L)))
  }

  test("stratified sampling is deterministic, partition-independent, rate-honoring") {
    import org.apache.spark.sql.functions.col
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5, "de" -> 0.1)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.stratified(df, "doc_id", "lang", rates)
        .collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    assert(ids(docs) == a, "same input must sample identically")
    assert(ids(docs.repartition(13)) == a, "partitioning must not change membership")
    val en = a.count(_ % 2 == 0).toDouble / 1000
    val de = a.count(_ % 2 == 1).toDouble / 1000
    assert(math.abs(en - 0.5) < 0.06, s"en rate drifted: $en")
    assert(math.abs(de - 0.1) < 0.04, s"de rate drifted: $de")
  }

  test("corpus mixing samples each source at its rate with independent draws") {
    val a = (0L until 1000L).map(i => (i, s"a$i")).toDF("doc_id", "text")
    val b = (0L until 1000L).map(i => (i, s"b$i")).toDF("doc_id", "text")
    val out = Sampling.mix(Seq(("web", a, 0.5), ("books", b, 0.1)), "doc_id")
      .collect().map(r => (r.getString(2), r.getLong(0)))
    val web = out.count(_._1 == "web").toDouble / 1000
    val books = out.count(_._1 == "books").toDouble / 1000
    assert(math.abs(web - 0.5) < 0.06, s"web rate drifted: $web")
    assert(math.abs(books - 0.1) < 0.04, s"books rate drifted: $books")
    // tag-salted: the same id draws independently per source
    val webIds = out.collect { case ("web", i) => i }.toSet
    val bookIds = out.collect { case ("books", i) => i }.toSet
    assert(!bookIds.subsetOf(webIds), "per-source draws should be independent")
  }

  test("fast-hash LSH finds the planted near-dups (production xxhash64 path)") {
    val pairs = Dedup.minhashPairs(fixture, "doc_id", "text",
        minJaccard = 0.4, fastHash = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup must survive the hash swap")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc matched")
  }

  test("bloom-prefiltered decontamination equals the exact semi-join even at high fpp") {
    // fpp=0.5 floods the prefilter with false positives; the exact
    // confirm join must scrub every one, leaving results identical to
    // the unfiltered form.
    val docs = ((0L until 40L).map(i =>
      (i, s"unique document number $i talking about topic ${i % 7} in many distinct words ${i * 31}")) ++
      Seq((100L, "the exact overlapping benchmark sentence appears in train and eval sets verbatim here")))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (0L, "the exact overlapping benchmark sentence appears in train and eval sets verbatim here"),
      (1L, "a completely different eval prompt that shares no eight gram with any training document"))
      .toDF("doc_id", "text")
    def plain(n: Int) = {
      import org.apache.spark.sql.functions.{col, explode}
      docs.select(col("doc_id"),
          explode(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), n)).as("g"))
        .join(eval_.select(explode(
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), n)).as("g")).distinct(),
          Seq("g"), "left_semi")
        .select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
    }
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Decontamination.ngramOverlapBloom(docs, eval_, "doc_id", "text", fpp = fpp)
        .collect().map(_.getLong(0)).toSet
      assert(got == plain(8), s"fpp=$fpp diverged from the exact form")
      assert(got == Set(100L), "only the planted overlap should be flagged")
    }
  }

  /** A high-cosine neighbor whose TABLE-0/PLANE-0 projection sign is
    * flipped and every other sign kept: reflect `v` across hyperplane
    * (table 0, bit 0). Exact by construction (w·refl = -(w·v)); the
    * other planes' margins are checked by the callers' precondition
    * asserts, so a bad seed fails loudly as "fixture broke", never as a
    * silent wrong-semantics pass.
    */
  private def reflectedFixture(dim: Int): (Array[Float], Array[Float], Array[Float]) = {
    def w(t: Int, b: Int): Array[Double] =
      Embeddings.planeWeights(Embeddings.DefaultSeed, t, b, dim).map(_.toDouble)
    val w00 = w(0, 0)
    // mirror of Embeddings.projBucket's float->double sequential fold
    def sign(vec: Array[Float], ws: Array[Double]): Boolean =
      vec.map(_.toDouble).zip(ws).map { case (a, b) => a * b }.sum >= 0
    // first RNG seed whose reflection flips ONLY plane (0,0) across both
    // tables' first 4 planes, for the float-rounded vectors Spark sees
    // (a reflection flips its own plane exactly, but can nudge a
    // small-margin other plane; the search makes the fixture margin-safe
    // deterministically instead of depending on one lucky seed)
    val (vf, rf) = (1 to 500).iterator.map { s =>
      val rnd = new scala.util.Random(s)
      val v = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val proj = v.zip(w00).map { case (a, b) => a * b }.sum / dim
      val refl = v.zip(w00).map { case (a, b) => a - 2 * proj * b }
      (v.map(_.toFloat), refl.map(_.toFloat))
    }.find { case (vf, rf) =>
      val sf = vf.map(x => x * 1.1f)
      sign(vf, w00) != sign(rf, w00) &&
        (for (t <- 0 to 1; b <- 0 until 4; if (t, b) != ((0, 0))) yield
          sign(vf, w(t, b)) == sign(rf, w(t, b)) &&
            sign(vf, w(t, b)) == sign(sf, w(t, b))).forall(identity) &&
        sign(vf, w00) == sign(sf, w00)
    }.getOrElse(fail("no margin-safe reflection fixture in 500 seeds"))
    (vf, rf, vf.map(x => x * 1.1f))
  }

  private def bucketStrings(emb: DataFrame, dim: Int, bits: Int, table: Int): Array[String] =
    emb.orderBy($"vec_id")
      .select(Embeddings.projBucket($"embedding", dim, bits, table).as("b"))
      .collect().map(_.getString(0))

  test("multi-table LSH finds neighbors that a single table misses") {
    // vec 1 = vec 0 reflected across table-0/plane-0: hamming 1 in
    // table 0 (invisible to the single-table probe), hamming 0 in
    // table 1 (recovered by tables >= 2); vec 2 = positive scaling of
    // vec 0, colliding in BOTH tables — must be scored once.
    val dim = 16
    val (v, refl, scaled) = reflectedFixture(dim)
    val emb = Seq((0L, v), (1L, refl), (2L, scaled)).toDF("vec_id", "embedding")
    val b0 = bucketStrings(emb, dim, 4, table = 0)
    val b1 = bucketStrings(emb, dim, 4, table = 1)
    assert(b0(0).zip(b0(1)).count { case (x, y) => x != y } == 1,
      s"fixture: table-0 buckets must differ in exactly one plane: ${b0.toSeq}")
    assert(b1(0) == b1(1), s"fixture: table-1 buckets must agree: ${b1.toSeq}")
    assert(b0(2) == b0(0) && b1(2) == b1(0), "positive scaling must preserve buckets")
    val q = emb.filter($"vec_id" === 0L)
    val single = Embeddings.lshTopK(emb, q, "vec_id", "embedding", dim, bits = 4, k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(single == Set(2L), "table 0 alone must miss the reflected neighbor")
    val multi = Embeddings.lshTopKMultiTable(
        emb, q, "vec_id", "embedding", dim, bits = 4, tables = 2, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(multi.map(_._1).toSet == Set(1L, 2L),
      s"table 1 must recover the neighbor: $multi")
    assert(multi.map(_._1).distinct.length == multi.length,
      "a pair colliding in both tables must be scored once")
  }

  test("multi-probe LSH recovers the neighbor one projection sign away") {
    val dim = 16
    val (v, refl, scaled) = reflectedFixture(dim)
    val emb = Seq((0L, v), (1L, refl), (2L, scaled)).toDF("vec_id", "embedding")
    val b = bucketStrings(emb, dim, 4, table = 0)
    assert(b(0).zip(b(1)).count { case (x, y) => x != y } == 1,
      s"fixture must sit at hamming 1: ${b.toSeq}")
    val q = emb.filter($"vec_id" === 0L)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(1)).toSet
    assert(ids(Embeddings.lshTopK(emb, q, "vec_id", "embedding", dim, 4, 2)) == Set(2L),
      "single probe should only see its own bucket")
    assert(ids(Embeddings.lshTopKMultiProbe(emb, q, "vec_id", "embedding", dim, 4, 2)) == Set(1L, 2L),
      "multi-probe should add the Hamming-1 bucket's neighbor")
  }

  test("projection-bucket LSH pairs identical vectors at cosine 1") {
    val emb = Seq(
      (0L, Array(0.5f, 0.5f, -0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f)),
      (1L, Array(0.5f, 0.5f, -0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f)),
      (2L, Array(-0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f)) // cosine 0.5 to 0/1
    ).toDF("vec_id", "embedding")
    val pairs = Embeddings.lshCosinePairs(emb, "vec_id", "embedding",
        dim = 8, bits = 8, minCosine = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.keySet == Set((0L, 1L)))
    assert(math.abs(pairs((0L, 1L)) - 1.0) < 1e-12)
  }

  test("multi-table ANN recall floor holds on the real sf0.01 embeddings") {
    // The llm_emb_recall_mt gate raise_error()s below avg recall 0.8;
    // this pins the same floor in `sbt test` on the driver's real data
    // (measured 0.93 — true top-3 neighbors sit at median cosine 0.34,
    // a genuinely hard LSH regime, so the margin is earned).
    val path = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(path).exists(), s"$path not generated here")
    val emb = spark.read.parquet(path)
    val q = emb.filter($"vec_id" < 50)
    val k = 3
    import org.apache.spark.sql.functions.col
    val bf = Embeddings.bruteForceTopK(emb, q, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val ls = Embeddings.lshTopKMultiTable(
        emb, q, "vec_id", "embedding", dim = 64, bits = 3, tables = 10, k = k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ls.join(bf, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / (50 * k)
    assert(recall >= 0.8, f"multi-table recall@3 floor violated: $recall%.3f")
  }

  test("nearest-centroid assignment: centroids map to themselves, argmax is exact") {
    import org.apache.spark.sql.functions.col
    val rng = new java.util.SplittableRandom(7)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(16)(rng.nextDouble().toFloat * 2 - 1))).toDF("vec_id", "embedding")
    val out = Embeddings.assignClusters(vecs, vecs.filter(col("vec_id") < 4),
      "vec_id", "embedding")
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.size == 40, "every vector gets exactly one assignment")
    for (i <- 0L until 4L) {
      // self-cosine is 1 ± an ulp (dot/(sqrt·sqrt) rounding) — the
      // assignment itself must still be exact
      assert(rows(i)._1 == i, s"centroid $i must assign to itself")
      assert(math.abs(rows(i)._2 - 1.0) < 1e-12, rows(i))
    }
    assert(rows.values.forall { case (c, s) => c >= 0 && c < 4 && s <= 1.0 + 1e-9 })
    // argmax agrees with a brute-force recompute
    val cents = vecs.filter(col("vec_id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val all = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    for ((id, v) <- all) {
      val want = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .toSeq.sortBy { case (cid, s) => (-s, cid) }.head._1
      assert(rows(id)._1 == want, s"vector $id assigned to ${rows(id)._1}, brute force says $want")
    }
  }

  test("prototype pruning drops exactly floor(n/4) per cluster, centroids first") {
    import org.apache.spark.sql.functions.col
    val rng = new java.util.SplittableRandom(13)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(16)(rng.nextDouble().toFloat * 2 - 1))).toDF("vec_id", "embedding")
    val out = Embeddings.prototypePrune(vecs, vecs.filter(col("vec_id") < 4),
        "vec_id", "embedding", pruneNum = 1, pruneDenom = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getLong(4), r.getBoolean(5)))
    assert(out.length == 40, "every vector gets a verdict")
    val byCluster = out.groupBy(_._2)
    for ((cid, rows) <- byCluster) {
      val n = rows.head._4
      assert(rows.forall(_._4 == n) && n == rows.length)
      assert(rows.count(!_._5) == n / 4, s"cluster $cid: floor(n/4) pruned")
      // rank 1 is the centroid itself (self-cosine 1); pruned iff n >= 4
      val rank1 = rows.find(_._3 == 1).get
      assert(rank1._1 == cid, s"cluster $cid rank-1 must be its centroid")
      if (n >= 4) assert(!rank1._5, "most-prototypical row pruned first")
    }
  }

  test("centroid update: means move toward assigned members, k-means iterates") {
    import org.apache.spark.sql.functions.col
    // two tight planted clusters around orthogonal axes
    val rng = new java.util.SplittableRandom(11)
    def near(axis: Int, i: Long) = (0 until 8).map { j =>
      (if (j == axis) 1.0f else 0.0f) + (rng.nextDouble().toFloat - 0.5f) * 0.1f
    }
    val vecs = ((0L until 10L).map(i => (i, near(0, i))) ++
      (10L until 20L).map(i => (i, near(4, i)))).toDF("vec_id", "embedding")
    val assigned = Embeddings.assignClusters(vecs,
      vecs.filter(col("vec_id") === 0L || col("vec_id") === 10L), "vec_id", "embedding")
    val means = Embeddings.centroidUpdate(assigned, vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(means.size == 16, "2 clusters x 8 components")
    // cluster 0's dominant component is axis 0; cluster 10's is axis 4
    assert(means((0L, 0)) > 0.9 && means((0L, 4)) < 0.1, means((0L, 0)))
    assert(means((10L, 4)) > 0.9 && means((10L, 0)) < 0.1, means((10L, 4)))
  }

  test("tfidf ranks a document-specific term above corpus-wide terms") {
    val docs = Seq(
      (0L, "apple apple common filler"),
      (1L, "common filler other words"),
      (2L, "common filler more words"),
      (3L, "common filler yet again")
    ).toDF("doc_id", "text")
    val top = Corpus.tfidfTopK(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getInt(5)))
    val doc0 = top.filter(_._1 == 0L).sortBy(_._4)
    assert(doc0.head._2 == "apple", s"doc 0 top term should be 'apple', got $doc0")
    assert(doc0.head._3 == 1L, "'apple' appears in exactly one document")
    assert(top.count(_._1 == 0L) == 2 && top.forall(t => t._4 >= 1 && t._4 <= 2))
  }

  test("dup-span stats count exactly the spans shared across documents") {
    val docs = Seq(
      (0L, "a b c d e"),   // spans3: "a b c","b c d","c d e"
      (1L, "x a b c y"),   // shares only "a b c"
      (2L, "p q r s t")    // shares nothing
    ).toDF("doc_id", "text")
    val out = Corpus.dupSpanStats(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((3L, 1L)), s"doc 0: 3 spans, 1 shared; got ${out(0L)}")
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 0L)))
  }

  test("sequence packing: offsets are a prefix sum, windows straddle correctly") {
    val docs = Seq(
      (0L, ("w " * 5).trim, "s"),   // 5 tokens  -> [0, 5)   pack 0
      (1L, ("w " * 4).trim, "s"),   // 4 tokens  -> [5, 9)   straddles 0 -> 1 at cap 8
      (2L, ("w " * 8).trim, "s"),   // 8 tokens  -> [9, 17)  packs 1..2
      (3L, ("w " * 2).trim, "t")    // other source restarts at offset 0
    ).toDF("doc_id", "text", "source")
    val out = Corpus.packChunks(docs, "doc_id", "text", "source", capacity = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(0L) == ((0L, 0L, 0L, 1L)))
    assert(out(1L) == ((5L, 0L, 1L, 2L)), "doc 1 must straddle packs 0 and 1")
    assert(out(2L) == ((9L, 1L, 2L, 2L)))
    assert(out(3L) == ((0L, 0L, 0L, 1L)), "new source restarts the stream")
  }

  test("chunking covers every token with the requested overlap; short docs get one chunk") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "a b c")                                    // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = Corpus.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    // ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6; 6+4=10 covers every token
    assert(d0.map(c => (c._3, c._4)) === Seq(
      (0L, "t1 t2 t3 t4"), (3L, "t4 t5 t6 t7"), (6L, "t7 t8 t9 t10")))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 1 && d1.head._4 == "a b c")
    // gapped sampling (stride > chunkSize) must not emit a zero-length
    // phantom chunk past the end (its md5("") would collide corpus-wide)
    val gapped = Corpus.chunkTokens(docs, "doc_id", "text", chunkSize = 2, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    assert(gapped.forall(_._2 > 0), s"empty phantom chunk emitted: ${gapped.toSeq}")
    assert(gapped.count(_._1 == 1L) == 1)
  }

  test("PII scrub replaces emails/phones/IPs with typed tokens, nothing else") {
    val df = Seq(
      (1L, "write to alice.smith+spam@mail.example.org today"),
      (2L, "call +44-207-1234 or visit 192.168.1.254 now"),
      (3L, "no pii here, just words and 12345 numbers"),
      (4L, "a@b.io x 10.0.0.1")
    ).toDF("id", "text")
    val out = df.select($"id", TextFunctions.scrubPii($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <EMAIL> today")
    assert(out(2L) == "call <PHONE> or visit <IP> now")
    assert(out(3L) == "no pii here, just words and 12345 numbers")
    assert(out(4L) == "<EMAIL> x <IP>")
  }

  test("chunk dedup collapses repeated chunk content to its canonical owner") {
    val body = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (7L, body, "en"),          // duplicate content, larger id
      (3L, body, "de"),          // canonical owner (min doc_id)
      (9L, "x y z", "fr")        // unique single-chunk doc
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.chunkDedup(docs, "doc_id", "text",
        chunkSize = 4, stride = 3, keepCols = Seq("lang"))
      .collect()
      .map(r => (r.getAs[String]("chunk_hash"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_copies"), r.getAs[String]("lang")))
    // docs 3 and 7 produce 3 identical chunks each -> 3 distinct hashes,
    // all owned by doc 3 with 2 copies; doc 9 owns its single chunk
    assert(out.length == 4, s"expected 4 distinct chunks: ${out.toSeq}")
    assert(out.count { case (_, id, n, lang) => id == 3L && n == 2L && lang == "de" } == 3)
    assert(out.count { case (_, id, n, lang) => id == 9L && n == 1L && lang == "fr" } == 1)
    // one lazy plan: the composition must not materialize eagerly, so the
    // analyzed tree still shows the full chunk -> dedup -> join chain
    val analyzed = Corpus.chunkDedup(docs, "doc_id", "text", 4, 3, Seq("lang"))
      .queryExecution.analyzed.toString
    assert(analyzed.contains("Aggregate") && analyzed.contains("Join"), analyzed)
  }

  test("hash split is exclusive, exhaustive, and near the requested weights") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val out = Sampling.split(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 2000L, "every row lands in exactly one split")
    assert(out("train") > 1500 && out("train") < 1700, s"train ~80%: $out")
    assert(out("val") > 120 && out("val") < 280, s"val ~10%: $out")
  }

  test("split draws independently of an upstream hash sample (salted bucket)") {
    // unsalted, rows surviving a rate-0.5 sample all have bucket < 5000
    // and an 80/10/10 split would label every one of them 'train'
    val docs = spark.range(0, 2000).toDF("doc_id")
      .withColumn("s", org.apache.spark.sql.functions.lit("x"))
    val sampled = Sampling.stratified(docs, "doc_id", "s", rates = Map("x" -> 0.5))
    val out = Sampling.split(sampled, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("val") && out.contains("test"),
      s"val/test must survive composition with upstream sampling: $out")
  }

  test("heavy hitters equal the full top-k and survive hostile partitioning") {
    import org.apache.spark.sql.functions._
    // 40 partitions over a stream where 'alpha'/'beta' dominate: the
    // MG candidate pass must surface them from every partition layout.
    val docs = spark.range(0, 2000).toDF("doc_id")
      .repartition(40)
      .withColumn("text",
        concat_ws(" ", lit("alpha"), lit("alpha"), lit("beta"),
          concat(lit("rare"), col("doc_id") % 500)))
    val out = Corpus.heavyHitters(docs, "text", k = 2, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == Set(("alpha", 4000L, 1), ("beta", 2000L, 2)),
      s"exact recount must rank the true heavy hitters: ${out.mkString(", ")}")
    // tiny capacity still catches a majority token (pigeonhole bound)
    val one = Corpus.heavyHitters(docs, "text", k = 1, capacity = 2)
      .collect().map(r => r.getString(0))
    assert(one.sameElements(Array("alpha")))
  }

  test("count-min estimates never underestimate and stay within the collision bound") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 500).toDF("doc_id")
      .withColumn("text",
        concat_ws(" ", lit("hot"), lit("hot"), concat(lit("cold"), col("doc_id"))))
    val counters = Corpus.cmsCounters(docs, "text", depth = 4, width = 1024)
    val nCounters = counters.count()
    assert(nCounters <= 4 * 1024, "counter table bounded by depth x width")
    val queries = Seq("hot", "cold7", "cold499").toDF("token")
    val est = Corpus.cmsEstimate(queries, counters, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("hot" -> 1000L, "cold7" -> 1L, "cold499" -> 1L)
    val n = 1500L
    for ((tok, truth) <- exact) {
      assert(est(tok) >= truth, s"$tok: count-min must never underestimate")
      assert(est(tok) <= truth + 16 * n / 1024,
        s"$tok: est ${est(tok)} beyond the collision bound over $truth")
    }
  }

  test("hammingPairs64 finds pairs within distance 3, guards mega-buckets") {
    val base = 0x0123456789abcdefL
    val near = base ^ 0x7L          // 3 low bits flipped -> distance 3
    val far = ~base                 // distance 64
    val rows = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "fp")
    val pairs = graft.llm.Dedup.hammingPairs64(rows, "id", "fp")
    try {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.toSeq == Seq((1L, 2L, 3)), s"got ${got.mkString(", ")}")
    } finally pairs.unpersist()
    // 70 identical fingerprints: every band is a mega-bucket (> 64), so
    // the guard must drop them all rather than going quadratic
    val hot = (0L until 70L).map(i => (i, 42L)).toDF("id", "fp")
    val guarded = graft.llm.Dedup.hammingPairs64(hot, "id", "fp")
    try assert(guarded.count() == 0, "mega-bucket must be dropped")
    finally guarded.unpersist()
  }

  test("token budget keeps the md5-order prefix per source, overshoots by at most one doc") {
    val docs = (0L to 5L).map(i => (i, ("w " * 10).trim, "s"))
      .toDF("doc_id", "text", "source")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val order = (0L to 5L).sortBy(i => (md5hex(s"budget:$i"), i))
    val out = Sampling.tokenBudget(docs, "doc_id", "text", "source",
        budgets = Map("s" -> 25L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // 10-token docs against a 25-token budget: tok_before 0/10/20 keep
    // (20 < 25 overshoots to 30 total), 30+ drop
    assert(out.keySet == order.take(3).toSet, s"kept ${out.keySet}, order $order")
    assert(order.take(3).map(out) == Seq(0L, 10L, 20L), "prefix sums in hash order")
    val none = Sampling.tokenBudget(docs, "doc_id", "text", "source", Map.empty)
    assert(none.count() == 0, "absent source falls back to the 0 default budget")
  }

  test("boilerplate scrub excises exactly the cross-document spans, keeps the rest") {
    val docs = Seq(
      (0L, "x1 x2 foo bar baz qux quux a1 a2"),
      (1L, "y1 foo bar baz qux quux y2 y3"),
      (2L, "p q r s t u")
    ).toDF("doc_id", "text")
    val out = Corpus.scrubDuplicateSpans(docs, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    // only "foo bar baz qux quux" occurs in two documents; each covered
    // position dies, everything outside the interval survives in order
    assert(out(0L) == (("x1 x2 a1 a2", 5)), s"doc 0: ${out(0L)}")
    assert(out(1L) == (("y1 y2 y3", 5)), s"doc 1: ${out(1L)}")
    assert(out(2L) == (("p q r s t u", 0)), "untouched doc passes through")
  }

  test("boilerplate scrub: saturated, partial-tail and adjacent coverage (r7 interval union)") {
    // the O(T·H)→O(T+H·n) rewrite must keep exact coverage semantics on
    // the shapes that stress it: every-position hits (saturated doc),
    // hits whose interval runs past the last token, and back-to-back
    // intervals that must not swallow the token between/after them
    val flood = (1 to 12).map(_ => "c1 c2 c3 c4 c5").mkString(" ")
    val docs = Seq(
      (0L, flood),                                  // fully boilerplate: all 60 tokens covered
      (1L, s"head $flood tail"),                    // covered middle, 1-token edges survive
      (2L, "c1 c2 c3 c4 c5 solo"),                  // hit at 0: positions 0..4 die, 5 lives
      (3L, "z1 z2 z3 z4 z5 z6")                     // clean
    ).toDF("doc_id", "text")
    val out = Corpus.scrubDuplicateSpans(docs, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(0L) == (("", 60)), s"saturated doc must empty out: ${out(0L)}")
    assert(out(1L) == (("head tail", 60)), s"edges must survive: ${out(1L)}")
    assert(out(2L) == (("solo", 5)), s"token after the interval survives: ${out(2L)}")
    assert(out(3L) == (("z1 z2 z3 z4 z5 z6", 0)), "clean doc untouched")
  }

  test("familiarity is the exact integer mean token probability; oov vs the count threshold") {
    val docs = Seq((0L, "a a b"), (1L, "a b c")).toDF("doc_id", "text")
    // corpus counts: a=3 b=2 c=1, T=6
    val out = Corpus.familiarity(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((3L, 8L, 8.0 / 18.0, 0.0)), s"doc 0: ${out(0L)}")
    assert(out(1L) == ((3L, 6L, 6.0 / 18.0, 1.0 / 3.0)), s"doc 1: ${out(1L)}")
  }

  test("temperature sampling upweights the small source and caps the big one") {
    import org.apache.spark.sql.functions.col
    val docs = ((0L until 90L).map(i => (i, "A")) ++
      (90L until 100L).map(i => (i, "B"))).toDF("doc_id", "src")
    val out = Sampling.temperatureSample(docs, "doc_id", "src", targetDocs = 50L)
      .collect().map(r => (r.getLong(1), r.getString(0), r.getBoolean(6)))
    // q_A = sqrt(90)/(sqrt(90)+sqrt(10)) = 0.75 -> keep 37 of 90 (41%)
    // q_B = 0.25 -> 12 > |B| -> keep ALL 10 (100% vs natural 10% share)
    val kept = out.filter(_._3)
    assert(kept.count(_._2 == "B") == 10, "small source fully kept")
    assert(kept.count(_._2 == "A") == 37, s"big source capped at floor(0.75*50)")
    // deterministic: same input -> same kept set
    val again = Sampling.temperatureSample(docs, "doc_id", "src", 50L)
      .filter(col("keep")).collect().map(_.getLong(1)).toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("log-odds classifier: class-exclusive tokens pull scores apart, sign is right") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "good clean prose here", true),
      (1L, "good clean text here", true),
      (2L, "spam spam buy now", false),
      (3L, "buy spam now cheap", false),
      (4L, "good clean prose now", true) // mostly positive vocabulary
    ).toDF("doc_id", "text", "y")
    val out = Corpus.logOddsQuality(docs, "doc_id", "text", col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size == 5 && out.forall(_._2._1 == 4), "every doc, 4 tokens each")
    assert(out(0L)._2 > 0 && out(1L)._2 > 0, "positive-vocab docs score > 0")
    assert(out(2L)._2 < 0 && out(3L)._2 < 0, "negative-vocab docs score < 0")
    assert(out(4L)._2 > out(2L)._2, "mixed doc still beats pure spam")
    // higher positive purity -> higher score
    assert(out(0L)._2 > out(4L)._2, "doc with 'now' (neg-leaning) scores below pure positive")
  }

  test("nb classifier: class-specific vocab classifies correctly, priors break ties") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "hund katze maus hund", "de"),
      (1L, "katze hund maus maus", "de"),
      (2L, "dog cat mouse dog", "en"),
      (3L, "cat dog mouse mouse", "en"),
      (4L, "hund maus katze katze", "de"),
      (5L, "dog mouse cat cat", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.nbClassify(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(out.size == 6, "every doc classified exactly once")
    assert(out.forall { case (_, (t, p)) => t == p },
      s"disjoint vocabularies must classify perfectly: $out")
    // a doc with NO shared tokens falls back to prior + length terms only
    val novel = Corpus.nbClassify(
        docs.union(Seq((9L, "zzz qqq", "en")).toDF("doc_id", "text", "lang")),
        "doc_id", "text", "lang")
      .filter(col("doc_id") === 9L).collect().head
    assert(novel.getString(3) != null, "unseen-vocab doc still gets an argmax class")
  }

  test("source overlap matrix: shared spans counted, zero pairs emitted, jaccard exact") {
    val docs = Seq(
      (0L, "a b c", "A"), (1L, "a b d", "B"), (2L, "x y z", "C")
    ).toDF("doc_id", "text", "src")
    val out = Corpus.sourceOverlap(docs, "text", "src", n = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")),
      s"complete matrix expected: ${out.keySet}")
    assert(out(("A", "B")) == ((2L, 2L, 1L, 1.0 / 3.0)), out(("A", "B")))
    assert(out(("A", "C")) == ((2L, 2L, 0L, 0.0)))
    assert(out(("B", "C")) == ((2L, 2L, 0L, 0.0)))
  }

  test("bpe pair stats count adjacent positions, skip 1-char tokens, tie-break on pair") {
    val docs = Seq((0L, "aab ab x")).toDF("doc_id", "text")
    val out = Corpus.bpePairStats(docs, "text", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("ab", 2L, 1), ("aa", 1L, 2)),
      s"expected ab>aa and no pair from 'x': ${out.mkString(", ")}")
  }

  test("bpe training learns the classic merges and stops when no pair repeats") {
    val docs = Seq((0L, "low low lower")).toDF("doc_id", "text")
    val learned = Corpus.bpeTrain(docs, "text", merges = 5)
    // l-o and o-w both occur 3x -> lexicographic tie-break picks (l,o);
    // then (lo,w) 3x; then every remaining pair is a singleton -> stop
    assert(learned == Seq((1, "l", "o", "lo", 3L), (2, "lo", "w", "low", 3L)),
      s"got $learned")
  }

  test("bpe merge fold is left-to-right non-overlapping on runs") {
    val docs = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val learned = Corpus.bpeTrain(docs, "text", merges = 3)
    // 'aaaa' has 3 overlapping (a,a) positions x 2 occurrences = 6; the
    // merge rewrites each word to [aa, aa]; the follow-up (aa,aa) pair
    // occurs twice, merges to [aaaa]; then nothing repeats
    assert(learned == Seq((1, "a", "a", "aa", 6L), (2, "aa", "aa", "aaaa", 2L)),
      s"got $learned")
  }
}
