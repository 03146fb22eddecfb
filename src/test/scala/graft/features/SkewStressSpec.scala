package graft.features

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Skew immunity, measured instead of argued (VERDICT r2 #8): a corpus
  * where ONE key holds half the rows must (a) produce identical results
  * from every strategy and (b) shuffle only balanced aggregated state in
  * the agg strategies — no reduce task inherits the hot key's row count.
  * MapGroups, which shuffles raw rows by design, is the measured
  * counter-example: its hot task reads ~half the shuffle records, which
  * is exactly why it is the documented escape hatch and not the default.
  */
class SkewStressSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("g1", StringType, nullable = true),
    StructField("t", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)
  ))

  private val spec = FeatureSpec(
    keyCol = "k", valueCol = "v", timeCol = "t",
    windows = Seq(7, 30),
    groupings = Seq(GroupingFamily(Seq("g1"), Seq(Seq("a"), Seq("b")))))

  /** ~200k rows for key 0, ~20 rows for each of 9,999 other keys. */
  private def hotKeyFrame: DataFrame = {
    val rng = new java.util.SplittableRandom(5)
    val g1s = Array("a", "b", "c")
    def row(k: Long) = Row(k, g1s(rng.nextInt(3)), rng.nextLong(40),
      if (rng.nextInt(10) == 0) null else rng.nextLong(64) / 8.0)
    val rows = (0 until 200000).map(_ => row(0L)) ++
      (1L until 10000L).flatMap(k => (0 until 20).map(_ => row(k)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 16), schema)
  }

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

  /** Run `action` and return per-task shuffle-read record counts. */
  private def shuffleReadsPerTask(action: => Unit): Seq[Long] = {
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          val r = te.taskMetrics.shuffleReadMetrics.recordsRead
          if (r > 0) { recs.add(r); () }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // listener events are delivered async; wait until the queue is
      // quiet for 500 ms (bounded at 10 s)
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

  test("aggregator's sort-based fallback (threshold exceeded) is result-identical") {
    // SCALE.md claims "graceful sort-based fallback beyond the
    // ObjectHashAggregate threshold — no OOM cliff". Force the fallback
    // (threshold 4 « 10k keys) and pin that the answer is unchanged.
    val df = hotKeyFrame.cache()
    try {
      val expected = collectSorted(AggregatorStrategy(df, spec))
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4")
      try {
        val fallback = collectSorted(AggregatorStrategy(df, spec))
        assert(fallback == expected, "sort-based fallback diverged from hash path")
      } finally spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    } finally { df.unpersist(); () }
  }

  test("all strategies agree on the hot-key corpus") {
    val df = hotKeyFrame.cache()
    try {
      val expected = collectSorted(CaseWhenStrategy(df, spec))
      for (s <- Seq[FeatureStrategy](PivotRollupStrategy, MapGroupsStrategy,
          AggregatorStrategy, AutoStrategy))
        assert(collectSorted(s(df, spec)) == expected,
          s"${s.getClass.getSimpleName} diverged under skew")
    } finally { df.unpersist(); () }
  }

  test("agg strategies shuffle balanced aggregated state under skew; mapGroups concentrates") {
    val df = hotKeyFrame.cache()
    try {
      df.count() // materialize the cache outside the measured jobs
      val nKeys = 10000L
      val nRows = df.count()
      for (s <- Seq[FeatureStrategy](CaseWhenStrategy, AggregatorStrategy)) {
        val reads = shuffleReadsPerTask { s(df, spec).count(); () }
        // Partial aggregation collapses the hot key MAP-side: what crosses
        // the wire is per-key aggregated state (≈ nKeys records; each map
        // task emits at most its partition's distinct keys), never the
        // 400k raw rows — the hot key costs the shuffle nothing. (AQE then
        // legitimately coalesces the tiny reduce side into few tasks, so
        // per-task balance is asserted on totals, not task counts.)
        assert(reads.sum < 3 * nKeys,
          s"${s.getClass.getSimpleName}: shuffled ${reads.sum} records — " +
            s"looks like raw rows, not aggregated state ($nRows rows, $nKeys keys)")
      }
      // The counter-example: mapGroups shuffles raw rows, so the wire
      // carries the whole corpus and the hot key's 200k rows land in ONE
      // task (a group is indivisible) — the measured reason it's the
      // escape hatch, not the default.
      val mgReads = shuffleReadsPerTask { MapGroupsStrategy(df, spec).count(); () }
      // (mapGroups prunes rows beyond the max window before the shuffle,
      // so "all raw rows" means the ~3/4 of the corpus inside t<=30 —
      // assert same order as the corpus, 2 decades above the ~10k state
      // records the agg strategies moved)
      assert(mgReads.sum > nRows / 2,
        s"mapGroups should shuffle ~all surviving raw rows, saw ${mgReads.sum} of $nRows")
      assert(mgReads.max.toDouble / mgReads.sum > 0.4,
        s"mapGroups should concentrate the hot key (max=${mgReads.max} of ${mgReads.sum})")
    } finally { df.unpersist(); () }
  }
}
