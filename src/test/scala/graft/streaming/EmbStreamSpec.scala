package graft.streaming

import graft.SparkSpec
import graft.llm.Embeddings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ANN screen's claims, pinned: the stateless plan is
  * batching-invariant, identical to running the same plan as a batch
  * query, and routes/scores exactly like the persisted-index search it
  * twins ([[Embeddings.ivfIndexedTopK]]).
  */
class EmbStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val db = "graft_emb_stream_spec"

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  // two well-separated cells; ids 0/2 live near e1, id 4 on e2
  private lazy val indexName: String = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val name = s"$db.ivf"
    Embeddings.writeIvfIndex(
      vecs(0L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f, 0f),
        4L -> Seq(0f, 1f, 0f, 0f)),
      vecs(100L -> Seq(1f, 0f, 0f, 0f), 101L -> Seq(0f, 1f, 0f, 0f)),
      "vec_id", "embedding", name,
      "/root/repo/target/emb_stream_spec/ivf", buckets = 2)
    name
  }

  // 11 = duplicate of indexed 0; 13 = orthogonal to everything (novel)
  private val shardRows: Seq[(Long, Seq[Float])] = Seq(
    11L -> Seq(1f, 0f, 0f, 0f), 13L -> Seq(0f, 0f, 1f, 0f))

  private def screen(stream: DataFrame): DataFrame =
    EmbStream.annScreen(spark, indexName, stream,
      "vec_id", "embedding", nprobe = 1, minCos = 0.5)

  private def run(batches: Seq[Seq[(Long, Seq[Float])]], sink: String): Set[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = screen(in.toDF().select(col("_1").as("vec_id"), col("_2").as("embedding")))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(sink).select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("annScreen: stateless stream-static screen is batching-invariant") {
    val oneBatch = run(Seq(shardRows), "ann_one")
    val perVec = run(shardRows.map(Seq(_)), "ann_split")
    assert(oneBatch == perVec,
      "stateless screen must not depend on micro-batch boundaries")
    assert(oneBatch == Set((11L, 0L), (11L, 2L)),
      s"dup must match its cell's neighbors and the novel vector nothing: $oneBatch")
  }

  test("annScreen on a batch frame equals the streamed run (one plan, two modes)") {
    val streamed = run(Seq(shardRows), "ann_parity")
    val batch = screen(vecs(shardRows: _*))
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == streamed, "the same plan must mean the same thing in both modes")
  }

  test("annScreen matches the persisted-index search's routing and scoring") {
    // every (query, neighbor) the top-k search returns at sim >= minCos
    // must be a screen match for the same nprobe — same cells probed,
    // same cosine, same index
    val q = vecs(shardRows: _*)
    val topk = Embeddings.ivfIndexedTopK(spark, indexName, q,
        "vec_id", "embedding", nprobe = 1, k = 3)
      .filter(col("sim") >= 0.5)
    val screened = screen(q)
    val viaTopk = topk.join(screened,
        topk("query_id") === screened("query_id") &&
          topk("neighbor_id") === screened("neighbor_id"), "left_anti")
    assert(viaTopk.isEmpty,
      "a top-k result above the screen threshold must appear in the screen")
  }
}
