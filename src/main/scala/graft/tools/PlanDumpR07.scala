package graft.tools

import graft.GraftSession
import graft.{datagen, features, llm, queries}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Round-7 optimization evidence: dumps `.explain("formatted")` for every
  * query touched this round into /root/repo/plans/r07/<query>_<suffix>.txt
  * (suffix = args(0), "before" or "after"). Same trimming convention as
  * [[graft.PlanDump]].
  */
object PlanDumpR07 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val spark = GraftSession.build(8, "plandump-r07")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "200")
    Files.createDirectories(Paths.get("/root/repo/plans/r07"))

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val trimmed = plan.linesIterator.map(l =>
        if (l.length > 300) l.take(297) + "..." else l).mkString("\n")
      Files.writeString(Paths.get(s"/root/repo/plans/r07/${name}_$suffix.txt"), trimmed)
      println(s"wrote $name ($suffix)")
    }

    // the reference feature query, case-when strategy (ref_trx_casewhen /
    // ref_tiny_casewhen run exactly this plan)
    val refPath = queries.RefWorkload.ensure(spark, datagen.DataGen.VerifySlice,
      queries.RefWorkload.slicePath)
    val refDf = spark.read.parquet(refPath)
    dump("ref_trx_casewhen", features.CaseWhenStrategy(refDf, features.FeatureSpec.reference))

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dump("llm_scrub_boilerplate",
      llm.Corpus.scrubDuplicateSpans(docs, "doc_id", "text"))
    dump("llm_decontaminate_scrub", llm.Decontamination.scrubSpans(
      docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text"))

    // Connected-components round update (llm_dedup_clusters): the r7
    // change removed the per-round convergence JOIN — before, `changed`
    // re-joined `next` against `labels`; after, the self branch carries
    // the previous label through the aggregate and `changed` is a
    // filter over the just-checkpointed result. Both change-detection
    // plans dumped (the label values are identical; see Dedup.scala).
    if (suffix == "after" || suffix == "before") {
      import org.apache.spark.sql.functions.{lit, min => fmin, max => fmax}
      val pairs = llm.Dedup.minhashPairs(docs, "doc_id", "text")
      val ids = docs.select(col("doc_id").cast("long").as("id")).distinct()
      val edges = pairs
        .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
        .union(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      val labels = ids.select(col("id"), col("id").as("label"))
      val viaN = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val viaP = labels.as("x").join(labels.as("y"), col("x.label") === col("y.id"))
        .select(col("x.id").as("id"), col("y.label").as("label"))
      if (suffix == "before") {
        // r6 form: min-label aggregate, then changed = next JOIN labels
        val next = labels.union(viaN).union(viaP)
          .groupBy(col("id")).agg(fmin(col("label")).as("label"))
        dump("llm_dedup_clusters", next.as("n").join(labels.as("p"), Seq("id"))
          .filter(col("n.label") =!= col("p.label")))
      } else {
        // r7 form: the aggregate carries __old; changed = a plain filter
        val self = labels.select(col("id"), col("label"), col("label").as("__old"))
        val next = self
          .union(viaN.select(col("id"), col("label"), lit(null).cast("long").as("__old")))
          .union(viaP.select(col("id"), col("label"), lit(null).cast("long").as("__old")))
          .groupBy(col("id"))
          .agg(fmin(col("label")).as("label"), fmax(col("__old")).as("__old"))
        dump("llm_dedup_clusters", next.filter(col("label") =!= col("__old")))
      }
      pairs.unpersist()
    }

    // bucketed incremental dedup (llm_dedup_inc_bucketed's core plan)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_plandump_r07")
    llm.Dedup.writeBandedIndex(
      llm.Dedup.signatureIndex(docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"),
      "graft_plandump_r07.sig_idx", "/root/repo/target/tmp/plandump_r07_sig_idx")
    dump("llm_dedup_inc_bucketed", llm.Dedup.incrementalPairsBucketed(
      spark, "graft_plandump_r07.sig_idx",
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text"))

    spark.stop()
  }
}
