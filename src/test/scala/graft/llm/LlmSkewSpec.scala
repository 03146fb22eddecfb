package graft.llm

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The chunk-dedup skew claim, measured instead of argued: a corpus
  * where ONE chunk content floods the table (boilerplate with 100k
  * copies) must still dedup correctly AND must not ship the copies to
  * one reduce task — `min(struct)` inside the hash aggregate means the
  * hot hash leaves each map partition as ONE partial, so the reduce
  * side reads O(map partitions), not O(copies).
  */
class LlmSkewSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Per-task shuffle-read record counts for `action` (same pattern as
    * features.SkewStressSpec).
    */
  private def shuffleReadsPerTask(action: => Unit): Seq[Long] = {
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recs.add(te.taskMetrics.shuffleReadMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // listener events are delivered async; wait until the queue is
      // quiet for 500 ms (bounded at 10 s) — same as SkewStressSpec
      var last = -1
      var quiet = 0
      var waited = 0
      while (quiet < 5 && waited < 100) {
        Thread.sleep(100); waited += 1
        if (recs.size == last) quiet += 1 else { quiet = 0; last = recs.size }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    recs.asScala.toSeq
  }

  test("hot chunk hash is absorbed map-side; dedup result stays exact") {
    val nHot = 100000
    val boiler = "unsubscribe from this newsletter by clicking the link below"
    val rows = (0 until nHot).map(i => Row(i.toLong, boiler)) ++
      (0 until 1000).map(i => Row((nHot + i).toLong, s"unique document number $i body"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 16), schema)

    var collected: Array[Row] = Array.empty
    val perTask = shuffleReadsPerTask {
      collected = Corpus.chunkDedup(docs, "doc_id", "text",
        chunkSize = 32, stride = 24).collect()
    }

    // correctness under the flood: one row for the boilerplate chunk,
    // canonical owner doc 0, all copies counted
    val hot = collected.filter(_.getAs[Long]("n_copies") == nHot.toLong)
    assert(hot.length == 1, s"expected exactly one hot chunk row, got ${hot.length}")
    assert(hot.head.getAs[Long]("doc_id") == 0L)
    assert(collected.length == 1 + 1000)

    // skew shape: no task may read shuffle records on the order of the
    // copy count — the hot hash must arrive as per-map-partition
    // partials (≤16), so the worst task reads ~the distinct side only
    val worst = perTask.max
    assert(worst < nHot / 10,
      s"a reduce task read $worst shuffle records — hot hash not absorbed map-side")
  }
}
