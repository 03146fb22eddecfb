package graft.streaming

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class DocsStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val A = "the quick brown fox jumps over the lazy dog by the river bank"
  private val B = "completely different content about distributed query engines and shuffles"
  private val C = "a third novel document discussing minhash signatures and band joins"
  private val D = "yet another unique text mentioning structured streaming state stores"
  private val E = "fifth distinct passage on watermarks eviction and output modes"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("indexScreen: stateless stream-static screen is batching-invariant") {
    val index = Dedup.signatureIndex(docs(0L -> A, 2L -> B), "doc_id", "text")
    implicit val sqlCtx = spark.sqlContext

    // doc 11 = exact dup of indexed 0, doc 13 = novel, doc 15 = near-dup
    // of 0 (one word changed), doc 17 = novel
    val shardRows = Seq(
      11L -> A, 13L -> C,
      15L -> A.replace("quick", "rapid"), 17L -> D)

    def run(batches: Seq[Seq[(Long, String)]], sink: String): Set[(Long, Long)] = {
      val in = MemoryStream[(Long, String)]
      val q = DocsStream.indexScreen(
          in.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
          index, "doc_id", "text", minJaccard = 0.4)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table(sink).select(col("id"), col("index_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }

    val oneBatch = run(Seq(shardRows), "screen_one")
    val perDoc = run(shardRows.map(Seq(_)), "screen_split")
    assert(oneBatch == perDoc,
      "stateless screen must not depend on micro-batch boundaries")
    assert(oneBatch.contains((11L, 0L)), "exact dup of indexed doc must match")
    assert(oneBatch.contains((15L, 0L)), "near dup of indexed doc must match")
    assert(!oneBatch.exists(p => p._1 == 13L || p._1 == 17L),
      "novel docs must not match the index")
    assert(!oneBatch.exists(_._2 == 2L), "unrelated index doc matched")
  }

  test("foreachBatch ingest loop ≡ sequential batch ingests; replay ingests nothing") {
    // chunk 1: 11 dups indexed 0 (drop), 13 novel (keep+index)
    // chunk 2: 21 dups the chunk-1 KEPT 13 (drop — only possible if the
    //          index GREW between batches), 23 novel (keep), 25 dups 23
    //          within its own batch (drop — within-batch pairs)
    // chunk 3: 31 dups chunk-2's kept 23 (drop), 33 novel (keep)
    val chunks = Seq(
      Seq(11L -> A, 13L -> C),
      Seq(21L -> C, 23L -> D, 25L -> D),
      Seq(31L -> D, 33L -> E))

    def freshIndexDir(): String = {
      val dir = java.nio.file.Files.createTempDirectory("ingest_loop_idx").toString
      Dedup.signatureIndex(docs(0L -> A, 2L -> B), "doc_id", "text")
        .write.mode("overwrite").parquet(dir)
      dir
    }

    def ingestOne(idxDir: String, batch: DataFrame): Set[Long] = {
      val kept = Dedup.ingestFilter(
        spark.read.parquet(idxDir), batch, "doc_id", "text", minJaccard = 0.4)
      val ids = kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      Dedup.signatureIndex(kept, "doc_id", "text")
        .write.mode("append").parquet(idxDir)
      kept.unpersist()
      ids
    }

    // streaming loop: MemoryStream + processAllAvailable pins one chunk
    // per micro-batch; foreachBatch runs the batch operator and grows
    // the persisted index before the next batch arrives
    implicit val sqlCtx = spark.sqlContext
    val streamIdx = freshIndexDir()
    val streamKept = scala.collection.mutable.Set[Long]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        streamKept ++= ingestOne(streamIdx, batch)
        () // Unit return disambiguates the Scala/Java foreachBatch overloads
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try chunks.foreach { c => in.addData(c: _*); q.processAllAvailable() }
    finally q.stop()

    // the same chunks through plain sequential batch calls
    val batchIdx = freshIndexDir()
    val batchKept = chunks.flatMap(c => ingestOne(batchIdx, docs(c: _*))).toSet

    assert(streamKept.toSet == batchKept,
      "streaming foreachBatch loop diverged from sequential batch ingests")
    assert(streamKept.toSet == Set(13L, 23L, 33L),
      s"expected cross-batch and within-batch dups dropped, got $streamKept")
    val idxIds = spark.read.parquet(streamIdx)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(idxIds == Set(0L, 2L, 13L, 23L, 33L), s"index contents wrong: $idxIds")

    // crash-recovery replay of every chunk against the grown index:
    // the id guard makes re-ingest a no-op
    chunks.foreach { c =>
      assert(ingestOne(streamIdx, docs(c: _*)).isEmpty, "replay must ingest nothing")
    }
  }
}
