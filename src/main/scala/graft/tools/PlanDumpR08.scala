package graft.tools

import graft.GraftSession
import graft.llm
import graft.llm.TextFunctions
import graft.queries.QueryDef
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-8 optimization evidence: dumps `.explain("formatted")` for every
  * query touched this round into /root/repo/plans/r08/<query>_<suffix>.txt
  * (suffix = args(0), "before" or "after"). As in PlanDumpR07, "before"
  * forms are reconstructed inline from the r7 code (verbatim expression
  * structure, minus the EAGER persist/count wrappers so the dumped plan
  * shows the join/exchange skeleton rather than an InMemoryRelation);
  * "after" forms call the shipped code paths.
  */
object PlanDumpR08 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val spark = GraftSession.build(8, "plandump-r08")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "200")
    Files.createDirectories(Paths.get("/root/repo/plans/r08"))

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val trimmed = plan.linesIterator.map(l =>
        if (l.length > 300) l.take(297) + "..." else l).mkString("\n")
      Files.writeString(Paths.get(s"/root/repo/plans/r08/${name}_$suffix.txt"), trimmed)
      println(s"wrote $name ($suffix)")
    }

    // "big" mode: dump the pruned strategy scan over the 730-partition
    // bigslice layout (run AFTER the SPARK_GRAFT_REF_SCALE=bigslice bench
    // generated it) — the partition-pruning evidence VERDICT r7 #7 asks
    // for: a FileSourceScan over 730 hive partitions whose PushedFilters
    // carries LessThanOrEqual(t_minus,720).
    if (suffix == "big") {
      val bigPath = s"${graft.queries.RefWorkload.dataRoot}/bigslice"
      require(new java.io.File(s"$bigPath/_SUCCESS").exists(),
        s"run the bigslice bench first ($bigPath missing)")
      dump("ref_big_pivot_pruned", graft.features.PivotRollupStrategy(
        spark.read.parquet(bigPath), graft.features.FeatureSpec.reference))
      spark.stop()
      return
    }

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val shard = docs.filter(col("doc_id") % 10 === 0)
    val idxPath = "/root/repo/target/tmp/plandump_r08_sig_idx"
    llm.Dedup.signatureIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxPath)
    val index = spark.read.parquet(idxPath)

    // ---- llm_dedup_incremental (+ the pair core of llm_ingest_filter) ----
    val (bands, rowsPerBand, minJaccard, maxBucketSize) = (6, 2, 0.5, 64)
    val pairsFrame: DataFrame =
      if (suffix == "before") {
        // r7 union form: index ∪ shard signatures, banded union censused
        // and SELF-joined (both sides of the candidate join carry the
        // full index), shard-touching pairs filtered afterwards.
        val all = index.select(col("id"), col("hs"), col("sig"))
          .withColumn("__new", lit(false))
          .union(llm.Dedup.signatureIndex(shard, "doc_id", "text", bands, rowsPerBand)
            .withColumn("__new", lit(true)))
        val banded = all.select(col("id"), col("__new"),
          explode(TextFunctions.lshBandKeysFromSig(col("sig"), bands, rowsPerBand)).as("band"))
        val keep = banded.groupBy(col("band")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize)
          .select(col("band"))
        val discriminative = banded.join(keep, Seq("band"), "left_semi")
        val cands = discriminative.as("a")
          .join(discriminative.as("b"),
            col("a.band") === col("b.band") && col("a.id") < col("b.id")
              && (col("a.__new") || col("b.__new")))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
        cands
          .join(all.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
          .join(all.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            TextFunctions.jaccard(col("hs_a"), col("hs_b")).as("jaccard"))
          .filter(col("jaccard") >= lit(minJaccard))
      } else
        llm.Dedup.incrementalPairsPlan(index, shard, "doc_id", "text",
          bands, rowsPerBand, minJaccard, maxBucketSize)._1
    dump("llm_dedup_incremental", pairsFrame)
    dump("llm_ingest_filter",
      shard.join(index.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
        .join(pairsFrame.select(col("id_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti"))

    // ---- writeBandedIndex write-input plans ----
    val sig = llm.Dedup.signatureIndex(corpus, "doc_id", "text")
    if (suffix == "before") {
      // r7 write inputs: bands exploded straight off the (persisted)
      // signature frame, sigs written as-is — no bucket-aligned
      // repartition, so each write task held rows of every bucket.
      dump("llm_dedup_index_bands_write", sig.select(col("id"),
        explode(TextFunctions.lshBandKeysFromSig(col("sig"), bands, rowsPerBand)).as("band")))
      dump("llm_dedup_index_sigs_write", sig)
    } else {
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_plandump_r08")
      llm.Dedup.writeBandedIndex(sig, "graft_plandump_r08.sig_idx",
        "/root/repo/target/tmp/plandump_r08_sig_idx_bucketed", buckets = 8)
      dump("llm_dedup_index_bands_write",
        spark.table("graft_plandump_r08.sig_idx_sigs").select(col("id"),
            explode(TextFunctions.lshBandKeysFromSig(col("sig"), bands, rowsPerBand)).as("band"))
          .repartition(8, pmod(hash(col("band")), lit(8))))
      dump("llm_dedup_index_sigs_write",
        sig.repartition(8, pmod(hash(col("id")), lit(8))))
      // the bucketed ingest gate plan over the index the new writer built
      // (result-identical; committed to show the read side is unchanged)
      dump("llm_dedup_inc_bucketed", llm.Dedup.incrementalPairsBucketed(
        spark, "graft_plandump_r08.sig_idx", shard, "doc_id", "text"))
    }

    // ---- stream_windowed_agg / stream_session rounding nudge ----
    // The operators are plain DataFrame transforms; dumped over the batch
    // events table so the expression swap (round(sum) -> round(sum+1e-6))
    // is visible without a streaming sink. Shape is expected IDENTICAL —
    // the nudge is a per-row Add inside the aggregate's result expression.
    val ev = QueryDef.table(spark, "/root/testdata/sf0.001", "events")
    if (suffix == "before") {
      dump("stream_windowed_agg", ev
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("win.start").as("day"), col("event_type"),
          col("n_events"), col("total_value")))
      dump("stream_session", ev
        .withWatermark("ts", "1 day")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("session_value")))
    } else {
      dump("stream_windowed_agg", graft.streaming.EventsStream.windowedCounts(ev))
      dump("stream_session", graft.streaming.EventsStream.sessionCounts(ev))
    }

    spark.stop()
  }
}
