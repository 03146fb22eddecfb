package graft.queries

import graft.streaming.EventsStream
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Structured Streaming IN the correctness gate: the streaming pipelines
  * run for real (file source -> micro-batches -> sink) over a bounded
  * copy of the events table, and their results hash-match the same
  * DuckDB oracle the batch twin would use — streaming/batch parity as a
  * verified property, not a claim.
  */
object StreamingQueries {

  /** Stage a streaming source directory holding the events table
    * `copies` times (2 copies = every event duplicated, which gives the
    * streaming dedup something to do). Staged through the batch reader
    * so the raw file's TIMESTAMP(NANOS) is normalized to the micros the
    * stream schema declares.
    */
  private def stageSource(
      s: SparkSession, sfDir: String, name: String, copies: Int): String = synchronized {
    // keyed by scale dir: Verify (sf0.01) and Bench (sf0.1) must never
    // share a staged source — the oracle compares against sfDir's events
    val sf = Paths.get(sfDir).getFileName.toString
    val dst = s"/root/repo/target/stream_src/$sf-$name"
    if (!new java.io.File(s"$dst/_STAGED_$copies").exists()) {
      // persist across the per-copy writes: each write otherwise re-scans
      // and re-normalizes the source parquet (guide §2.4)
      val ev = QueryDef.table(s, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
        .persist()
      try {
        ev.write.mode("overwrite").parquet(dst)
        for (_ <- 1 until copies) ev.write.mode("append").parquet(dst)
      } finally ev.unpersist(blocking = false)
      Files.createFile(Paths.get(s"$dst/_STAGED_$copies"))
    }
    dst
  }

  /** Stage the events table as an EVENT-TIME-ORDERED sequence of parquet
    * files: `chunks` contiguous time-range slices (approxQuantile bounds
    * on ts), each written `copies` times as adjacent files, with strictly
    * increasing modification times so the file source (which orders by
    * modtime) replays them in event-time order. With
    * `maxFilesPerTrigger=1` every file is its own micro-batch — the
    * multi-batch harness that makes cross-batch watermark eviction and
    * cross-batch join/dedup state REAL in the gate, where the single
    * -batch twins pin only intra-batch semantics.
    *
    * Correctness contract for consumers: a stateful op is exact over this
    * source iff its watermark delay covers one chunk's event-time span
    * (span/chunks; 30-day events table, 6 chunks -> 5 days, gates use
    * 7 days): rows of batch n+1 are then never below the watermark set by
    * batch n, and a duplicate/join partner one batch behind still finds
    * its state — while chunks further back DO age out, which is the
    * eviction path being exercised. The nominal span/chunks math assumes
    * approxQuantile slices near-evenly; a skewed ts distribution could
    * stretch one chunk past the delay and silently re-admit rows past
    * evicted state, so the REALIZED spans (actual data min/max against
    * the quantile bounds) are asserted against `watermarkDelaySec`
    * at staging time — fail loudly here, not as a baffling gate
    * mismatch downstream.
    */
  private[graft] def stageOrderedSource(
      s: SparkSession, sfDir: String, name: String,
      copies: Int, chunks: Int = 6,
      watermarkDelaySec: Long = 7L * 86400): String = synchronized {
    val sf = Paths.get(sfDir).getFileName.toString
    val dst = s"/root/repo/target/stream_src/$sf-$name-ordered"
    val marker = s"$dst/_STAGED_${copies}x$chunks"
    if (!new java.io.File(marker).exists()) {
      val dstDir = new java.io.File(dst)
      if (dstDir.exists()) graft.Fs.deleteRecursively(dstDir)
      Files.createDirectories(Paths.get(dst))
      // persist for the staging jobs below: the quantile probe, the
      // extent check and every per-chunk filtered write otherwise each
      // re-scan the source parquet — 8 scans for a 6-chunk staging
      // (guide §2.4); the cache is dropped before the gate's stream runs
      val ev = QueryDef.table(s, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
        .persist()
      val qs = (1 until chunks).map(_.toDouble / chunks).toArray
      val bounds = ev.select(col("ts").cast("double").as("t"))
        .stat.approxQuantile("t", qs, 0.001)
      val lo = Double.NegativeInfinity +: bounds
      val hi = bounds :+ Double.PositiveInfinity
      // realized spans vs the consumers' watermark delay (see scaladoc):
      // replace the open first/last endpoints with the data's actual
      // extent, then require every chunk to fit inside the delay
      val ext = ev.agg(min(col("ts").cast("double")), max(col("ts").cast("double"))).head()
      val spans = (0 until chunks).map(i =>
        math.min(hi(i), ext.getDouble(1)) - math.max(lo(i), ext.getDouble(0)))
      require(spans.max < watermarkDelaySec,
        s"realized chunk span ${spans.max}s >= watermark delay ${watermarkDelaySec}s — " +
          s"skewed ts distribution; raise `chunks` or the consumers' delay (spans: $spans)")
      val base = System.currentTimeMillis() - chunks * copies * 2000L
      // a silently-failed mtime write would scramble the replay order and
      // surface as a baffling late-data gate mismatch — fail HERE instead
      def stamp(f: java.io.File, idx: Int): Unit =
        require(f.setLastModified(base + idx * 2000L),
          s"setLastModified failed for $f — ordered replay needs controlled mtimes")
      var idx = 0
      for (i <- 0 until chunks) {
        val tmp = s"$dst/__tmp"
        ev.filter(col("ts").cast("double") >= lo(i) &&
            col("ts").cast("double") < hi(i))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val first = new java.io.File(dst, f"chunk$i%02d-copy0.parquet")
        Files.move(part.toPath, first.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        stamp(first, idx); idx += 1
        // further copies are byte-identical: plain file copies, not
        // another scan+write Spark job per copy
        for (c <- 1 until copies) {
          val tgt = new java.io.File(dst, f"chunk$i%02d-copy$c.parquet")
          Files.copy(first.toPath, tgt.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          stamp(tgt, idx); idx += 1
        }
        graft.Fs.deleteRecursively(new java.io.File(tmp))
      }
      ev.unpersist(blocking = false)
      Files.createFile(Paths.get(marker))
    }
    dst
  }

  /** Stage the streaming-ingest-screen fixtures: the PERSISTED signature
    * index (docs with `doc_id % 10 != 0`, written once as parquet — the
    * "existing corpus" a daily pipeline keeps on disk) and the arriving
    * shard (`doc_id % 10 == 0`) as 5 single-file chunks so
    * `maxFilesPerTrigger=1` makes each its own micro-batch. Chunking is
    * by doc id, not event time — the screen is STATELESS, so batch
    * carve-up cannot affect results (that invariance is the point of the
    * gate; see DocsStream.indexScreen).
    */
  private def stageDocsScreen(s: SparkSession, sfDir: String): (String, String) = synchronized {
    val sf = Paths.get(sfDir).getFileName.toString
    val idxDst = s"/root/repo/target/stream_src/$sf-screen-index"
    val shardDst = s"/root/repo/target/stream_src/$sf-screen-shard"
    val docs = QueryDef.table(s, sfDir, "documents")
    if (!new java.io.File(s"$idxDst/_STAGED").exists()) {
      graft.llm.Dedup.signatureIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        .write.mode("overwrite").parquet(idxDst)
      Files.createFile(Paths.get(s"$idxDst/_STAGED"))
    }
    if (!new java.io.File(s"$shardDst/_STAGED").exists()) {
      val dstDir = new java.io.File(shardDst)
      if (dstDir.exists()) graft.Fs.deleteRecursively(dstDir)
      Files.createDirectories(Paths.get(shardDst))
      // persist the shard across the 5 chunk writes (guide §2.4): each
      // otherwise re-scans the documents parquet
      val shard = docs.filter(col("doc_id") % 10 === 0).persist()
      for (c <- 0 until 5) {
        val tmp = s"$shardDst/__tmp"
        shard.filter(expr("doc_id div 10") % 5 === c)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath,
          new java.io.File(shardDst, f"chunk$c%02d.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        graft.Fs.deleteRecursively(new java.io.File(tmp))
      }
      shard.unpersist(blocking = false)
      Files.createFile(Paths.get(s"$shardDst/_STAGED"))
    }
    (idxDst, shardDst)
  }

  /** Stage the streaming-ANN-screen shard: embeddings with
    * `vec_id % 10 == 0` as 5 single-file chunks so `maxFilesPerTrigger=1`
    * makes each its own micro-batch. Chunking is by id — the screen is
    * stateless, so the carve-up cannot affect results (the invariance
    * the gate exists to demonstrate). The IVF index side is NOT staged
    * here: the gate rebuilds it through `Embeddings.writeIvfIndex`
    * (external tables, rebuild-into-place safe) because catalog entries
    * don't survive a fresh JVM the way staged files do.
    */
  private def stageEmbScreen(s: SparkSession, sfDir: String): String = synchronized {
    val sf = Paths.get(sfDir).getFileName.toString
    val shardDst = s"/root/repo/target/stream_src/$sf-annscreen-shard"
    if (!new java.io.File(s"$shardDst/_STAGED").exists()) {
      val dstDir = new java.io.File(shardDst)
      if (dstDir.exists()) graft.Fs.deleteRecursively(dstDir)
      Files.createDirectories(Paths.get(shardDst))
      // persist the shard across the 5 chunk writes (guide §2.4)
      val shard = QueryDef.table(s, sfDir, "embeddings")
        .filter(col("vec_id") % 10 === 0).persist()
      for (c <- 0 until 5) {
        val tmp = s"$shardDst/__tmp"
        shard.filter(expr("vec_id div 10") % 5 === c)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath,
          new java.io.File(shardDst, f"chunk$c%02d.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        graft.Fs.deleteRecursively(new java.io.File(tmp))
      }
      shard.unpersist(blocking = false)
      Files.createFile(Paths.get(s"$shardDst/_STAGED"))
    }
    shardDst
  }

  /** Run a bounded streaming query to a memory sink and return its final
    * table. Trigger.AvailableNow processes every pending file in
    * micro-batches and stops — the batch-bounded execution of the same
    * incremental plan a live stream runs forever.
    */
  private def runBounded(
      spark: SparkSession, df: DataFrame,
      name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"/root/repo/target/stream_chk/$name-${System.nanoTime()}")
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  val defs: Seq[QueryDef] = Seq(

    // Daily windowed aggregation, streamed — must equal the batch GROUP
    // BY day/event_type over the doubled source.
    QueryDef("stream_windowed_agg",
      (s, dir) => {
        val src = stageSource(s, dir, "win", copies = 1)
        val res = runBounded(s,
          EventsStream.windowedCounts(EventsStream.readEvents(s, src)),
          "graft_stream_win", OutputMode.Complete())
        res.select(col("day"), col("event_type"), col("n_events"), col("total_value"))
      },
      Some("""SELECT date_trunc('day', ts) AS day, event_type,
             | count(*) AS n_events, round(sum(value) + 1e-6, 2) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Stream-stream interval join: the q23 range correlation with BOTH
    // sides streamed (state-buffered, watermark-evicted). One micro-batch
    // (maxFilesPerTrigger pin) so no match is lost to cross-batch state
    // eviction; inner matches emit append-mode without finalization.
    QueryDef("stream_interval_join",
      (s, dir) => {
        val src = stageSource(s, dir, "ssjoin", copies = 1)
        val all = EventsStream.readEvents(s, src, maxFilesPerTrigger = Some(Int.MaxValue))
        val res = runBounded(s,
          EventsStream.intervalJoin(
            all.filter(col("event_type") === "error"),
            all.filter(col("event_type") === "click")),
          "graft_stream_ssjoin", OutputMode.Append())
        res.select(col("event_id"), col("user_id"), col("click_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |   FROM events WHERE event_type = 'error'),
             | c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |   FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id, c.click_id
             |FROM e JOIN c ON e.user_id = c.user_id
             | AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts < e.ts""".stripMargin)),

    // Streaming sessionization: the batch q24 session windows as an
    // incremental stateful aggregation — same 30-minute gap, same
    // DuckDB islands oracle, hash-equal output (streaming/batch parity
    // for MERGING session state, not just tumbling windows).
    QueryDef("stream_session",
      (s, dir) => {
        val src = stageSource(s, dir, "session", copies = 1)
        runBounded(s,
          EventsStream.sessionCounts(EventsStream.readEvents(s, src)),
          "graft_stream_session", OutputMode.Complete())
          .select(col("user_id"), col("session_start"),
            col("n_events"), col("session_value"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
             |   FROM events),
             | x AS (SELECT user_id, ts, value,
             |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
             |   THEN 1 ELSE 0 END AS new_s FROM e),
             | y AS (SELECT user_id, ts, value,
             |   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM x)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
             | round(sum(value) + 1e-6, 2) AS session_value
             |FROM y GROUP BY user_id, sid""".stripMargin)),

    // Stream-static dimension join: streamed events enriched with the
    // static customer table (broadcast per micro-batch), aggregated by
    // market segment — must equal the batch join the oracle runs.
    QueryDef("stream_enrich",
      (s, dir) => {
        val src = stageSource(s, dir, "enrich", copies = 1)
        val dim = QueryDef.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val res = runBounded(s,
          EventsStream.enriched(
              EventsStream.readEvents(s, src), dim, "user_id", "c_custkey")
            .groupBy(col("c_mktsegment"))
            // +1e-6 nudge (repo rounding convention, see
            // stream_running_features): order-dependent double sums vs
            // DuckDB's arbitrary-order sum could ulp-flip a .xx5 boundary
            .agg(count(lit(1)).as("n_events"),
              round(sum(col("value")) + lit(1e-6), 2).as("total_value")),
          "graft_stream_enrich", OutputMode.Complete())
        res.select(col("c_mktsegment"), col("n_events"), col("total_value"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_events,
             | round(sum(value) + 1e-6, 2) AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // Streaming dedup over a source with every event duplicated (two
    // file copies): exactly-once per event_id must survive, i.e. the
    // plain distinct count of the original table.
    //
    // maxFilesPerTrigger = MaxValue pins BOTH copies into ONE micro-batch:
    // this twin asserts INTRA-batch dedup semantics over an arbitrarily
    // ordered source (files don't arrive in event-time order, so a
    // duplicate split into a later micro-batch could be re-emitted after
    // its twin's state was evicted). Cross-batch exactness + watermark
    // eviction are asserted by stream_dedup_mb below, whose source is
    // staged in event-time order.
    QueryDef("stream_dedup",
      (s, dir) => {
        val src = stageSource(s, dir, "dedup", copies = 2)
        val res = runBounded(s,
          EventsStream.dedup(
            EventsStream.readEvents(s, src, maxFilesPerTrigger = Some(Int.MaxValue))),
          "graft_stream_dedup", OutputMode.Append())
        // +1e-6 nudge: see stream_enrich
        res.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique"),
            round(sum(col("value")) + lit(1e-6), 2).as("value_sum"))
      },
      Some("""SELECT event_type, count(*) AS n_unique,
             | round(sum(value) + 1e-6, 2) AS value_sum
             |FROM events GROUP BY event_type""".stripMargin)),

    // MULTI-BATCH streaming dedup (ADVICE r3): 6 event-time-ordered
    // chunks, each file pair holding the same rows, one FILE per
    // micro-batch (maxFilesPerTrigger=1) — so every duplicate crosses a
    // batch boundary and must be caught from the state store, and the
    // 7-day watermark (> the 5-day chunk span) advances batch over batch,
    // evicting chunks >2 behind: cross-batch exactness AND eviction are
    // both exercised, not just the single-batch form.
    QueryDef("stream_dedup_mb",
      (s, dir) => {
        val src = stageOrderedSource(s, dir, "dedupmb", copies = 2)
        val res = runBounded(s,
          EventsStream.dedup(
            EventsStream.readEvents(s, src, maxFilesPerTrigger = Some(1)),
            delay = "7 days"),
          "graft_stream_dedup_mb", OutputMode.Append())
        // +1e-6 nudge: see stream_enrich
        res.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique"),
            round(sum(col("value")) + lit(1e-6), 2).as("value_sum"))
      },
      Some("""SELECT event_type, count(*) AS n_unique,
             | round(sum(value) + 1e-6, 2) AS value_sum
             |FROM events GROUP BY event_type""".stripMargin)),

    // Custom per-key state (flatMapGroupsWithState), gated: running
    // per-user feature counters over one time-ordered file per
    // micro-batch (6 batches) emit an updated row per touched user per
    // batch; since n_events strictly increases within a user, the
    // max_by row is the final state, and it must equal the batch
    // GROUP BY — custom cross-batch state, not just the built-in
    // windowed/dedup/session state the other gates exercise.
    QueryDef("stream_running_features",
      (s, dir) => {
        import s.implicits._
        val src = stageOrderedSource(s, dir, "runfeat", copies = 1)
        val ev = EventsStream.readEvents(s, src, maxFilesPerTrigger = Some(1))
          .as[EventsStream.Event]
        val res = runBounded(s,
          EventsStream.runningUserFeatures(ev).toDF(),
          "graft_stream_runfeat", OutputMode.Update())
        // +1e-6 nudge (the repo's rounding convention): the stateful
        // fold accumulates in event order while DuckDB sums in arbitrary
        // order, so a ulp difference at a .xx5 boundary could flip the
        // rounded digit; the shared epsilon shifts both sides off it.
        res.groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"),
            round(max_by(col("total_value"), col("n_events")) + lit(1e-6), 2)
              .as("total_value"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             | round(sum(value) + 1e-6, 2) AS total_value
             |FROM events GROUP BY user_id""".stripMargin)),

    // Streaming LLM ingest screening: documents STREAM in (5 micro-
    // batches) and are screened against the persisted MinHash signature
    // index — a pure STATELESS stream-static plan (band equi-join +
    // hash-set Jaccard rescoring; no watermark, no state store), so the
    // verdict per doc is batching-invariant and the batch oracle replays
    // it exactly. The growing-index foreachBatch loop (whose semantics
    // DO depend on batch boundaries) is pinned by DocsStreamSpec
    // instead. Output: one verdict row per shard doc.
    QueryDef("stream_ingest_screen",
      (s, dir) => {
        val (idxDir, shardDir) = stageDocsScreen(s, dir)
        val index = s.read.parquet(idxDir)
        val res = runBounded(s,
          graft.streaming.DocsStream.indexScreen(
            graft.streaming.DocsStream.readDocs(s, shardDir, maxFilesPerTrigger = Some(1)),
            index, "doc_id", "text"),
          "graft_stream_screen", OutputMode.Append())
        val matched = res.dropDuplicates("id", "index_id")
          .groupBy(col("id").as("doc_id"))
          .agg(count(lit(1)).as("__n"), max(col("jaccard")).as("__mx"))
        QueryDef.table(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
          .join(matched, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__n"), lit(0L)).as("n_index_dups"),
            (coalesce(col("__n"), lit(0L)) === 0).as("is_kept"),
            round(coalesce(col("__mx"), lit(0.0)) + lit(1e-6), 4).as("max_jaccard"))
      },
      Some(LlmQueries.streamScreenSql)),

    // Streaming QUALITY screen: the heuristic-filter half of ingest
    // (stream_ingest_screen is the dedup half) — arriving docs get the
    // Gopher-style verdict as pure per-row column math, stateless so
    // batching-invariant; the oracle replays quality + repetition
    // metrics and the keep decision over the same shard.
    QueryDef("stream_quality_screen",
      (s, dir) => {
        val (_, shardDir) = stageDocsScreen(s, dir)
        runBounded(s,
          graft.streaming.DocsStream.qualityScreen(
            graft.streaming.DocsStream.readDocs(s, shardDir,
              maxFilesPerTrigger = Some(1)),
            "doc_id", "text"),
          "graft_stream_quality", OutputMode.Append())
          .select(col("doc_id"),
            round(col("quality_raw") + lit(1e-6), 4).as("quality"),
            round(col("top_frac_raw") + lit(1e-6), 4).as("top_frac"),
            round(col("dup_frac_raw") + lit(1e-6), 4).as("dup_bigram_frac"),
            col("is_kept").cast("int").as("is_kept"))
      },
      Some {
        val stop = graft.llm.TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
        val sh2 = "list_transform(range(1, greatest(len(w)-1, 1)+1), " +
          "i -> array_to_string(w[i:i+1], ' '))"
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
           |  FROM documents WHERE doc_id % 10 = 0),
           |m AS (SELECT doc_id,
           |  0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
           |  + 0.4 * (len(list_distinct(w))::DOUBLE / len(w)::DOUBLE)
           |  + 0.3 * (1.0 - len(list_filter(w, x -> x IN ($stop)))::DOUBLE / len(w)::DOUBLE)
           |   AS qual,
           |  list_max(list_transform(list_distinct(w),
           |    x -> len(list_filter(w, y -> y = x))))::DOUBLE / len(w) AS top_frac,
           |  1.0 - len(list_distinct($sh2))::DOUBLE / len($sh2) AS dup_frac
           | FROM t)
           |SELECT doc_id, round(qual + 0.000001, 4) AS quality,
           | round(top_frac + 0.000001, 4) AS top_frac,
           | round(dup_frac + 0.000001, 4) AS dup_bigram_frac,
           | CAST(CASE WHEN round(qual + 0.000001, 4) >= 0.5
           |   AND round(top_frac + 0.000001, 4) <= 0.2
           |   AND round(dup_frac + 0.000001, 4) <= 0.3
           |   THEN 1 ELSE 0 END AS INT) AS is_kept
           |FROM m""".stripMargin
      }),

    // Streaming DECONTAMINATION screen: arriving docs' 8-grams stream
    // through the codegen'd Bloom probe (per-row bit test, right after
    // the source) and confirm against the exact eval-gram set with a
    // stream-static semi join — eval set = documents with
    // doc_id % 50 = 0, shard = doc_id % 10 = 0 (eval docs inside the
    // shard self-flag, which the oracle replays too). Stateless, one
    // row per contaminated gram occurrence; the gate aggregates hits
    // per doc. With the dedup, ANN and quality screens this completes
    // the four-screen ingest suite.
    QueryDef("stream_decontam_screen",
      (s, dir) => {
        val (_, shardDir) = stageDocsScreen(s, dir)
        val evalDocs = QueryDef.table(s, dir, "documents")
          .filter(col("doc_id") % 50 === 0)
        val (evalGrams, sketch) =
          graft.streaming.DocsStream.evalGramSketch(evalDocs, "text")
        // the memory sink holds the materialized rows once runBounded
        // returns, so the static gram frame can unpersist immediately
        val res = try {
          runBounded(s,
            graft.streaming.DocsStream.decontamScreen(
              graft.streaming.DocsStream.readDocs(s, shardDir,
                maxFilesPerTrigger = Some(1)),
              evalGrams, sketch, "doc_id", "text"),
            "graft_stream_decontam", OutputMode.Append())
            .groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
        } finally evalGrams.unpersist()
        QueryDef.table(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
          .join(res, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__n"), lit(0L)).as("n_hits"),
            (coalesce(col("__n"), lit(0L)) === 0).as("is_clean"))
      },
      Some {
        val sh8 = "list_transform(range(1, greatest(len(w)-7, 1)+1), " +
          "i -> array_to_string(w[i:i+7], ' '))"
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |ev AS (SELECT DISTINCT unnest($sh8) AS g FROM t WHERE doc_id % 50 = 0),
           |sg AS (SELECT doc_id, unnest($sh8) AS g FROM t WHERE doc_id % 10 = 0),
           |h AS (SELECT sg.doc_id, count(*) AS n FROM sg JOIN ev USING (g) GROUP BY 1)
           |SELECT s2.doc_id, coalesce(h.n, 0) AS n_hits,
           | coalesce(h.n, 0) = 0 AS is_clean
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) s2
           | LEFT JOIN h ON h.doc_id = s2.doc_id""".stripMargin
      }),

    // MULTI-BATCH stream-stream interval join: one time-ordered file per
    // micro-batch; a click near a chunk boundary must survive in join
    // state until its error arrives in the NEXT batch, and old click
    // state is watermark-evicted as batches advance. Same oracle as the
    // single-batch twin — cross-batch state must not lose (or double)
    // a single match.
    QueryDef("stream_interval_join_mb",
      (s, dir) => {
        val src = stageOrderedSource(s, dir, "ssjoinmb", copies = 1)
        val all = EventsStream.readEvents(s, src, maxFilesPerTrigger = Some(1))
        val res = runBounded(s,
          EventsStream.intervalJoin(
            all.filter(col("event_type") === "error"),
            all.filter(col("event_type") === "click"),
            delay = "7 days"),
          "graft_stream_ssjoin_mb", OutputMode.Append())
        res.select(col("event_id"), col("user_id"), col("click_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |   FROM events WHERE event_type = 'error'),
             | c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |   FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id, c.click_id
             |FROM e JOIN c ON e.user_id = c.user_id
             | AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts < e.ts""".stripMargin)),

    // Streaming ANN ingest screening: embedding vectors STREAM in (5
    // micro-batches) and are screened against the persisted IVF index
    // for semantic near-duplicates — the embedding-space twin of
    // stream_ingest_screen. Stateless by the same construction (the
    // per-query argmax over the codebook moves into the row as an
    // array_sort of the one-row broadcast codebook; no rank window, no
    // state store), so the verdict per vector is batching-invariant
    // and the batch oracle replays it exactly. Output: one verdict row
    // per shard vector.
    QueryDef("stream_ann_screen",
      (s, dir) => {
        val emb = QueryDef.table(s, dir, "embeddings")
        s.sql("CREATE DATABASE IF NOT EXISTS graft_ann")
        val name = s"graft_ann.stream_ivf_${QueryDef.dirSlug(dir)}"
        graft.llm.Embeddings.writeIvfIndex(
          emb.filter(col("vec_id") % 10 =!= 0), LlmQueries.lloydCentroids(emb),
          "vec_id", "embedding",
          name, s"target/tmp/stream_ivf_${QueryDef.dirSlug(dir)}")
        val shardDir = stageEmbScreen(s, dir)
        val res = runBounded(s,
          graft.streaming.EmbStream.annScreen(s, name,
            graft.streaming.EmbStream.readEmbeddings(
              s, shardDir, maxFilesPerTrigger = Some(1)),
            "vec_id", "embedding", nprobe = 3, minCos = 0.2),
          "graft_stream_ann", OutputMode.Append())
        val matched = res.groupBy(col("query_id").as("vec_id"))
          .agg(count(lit(1)).as("__n"), max(col("sim")).as("__mx"))
        emb.filter(col("vec_id") % 10 === 0).select(col("vec_id"))
          .join(matched, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("__n"), lit(0L)).as("n_near"),
            (coalesce(col("__n"), lit(0L)) === 0).as("is_novel"),
            round(coalesce(col("__mx"), lit(0.0)) + lit(1e-6), 4).as("max_sim"))
      },
      Some(LlmQueries.streamAnnScreenSql))
  )
}
