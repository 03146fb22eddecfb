package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine: the same transforms the
  * batch queries run (q15's windowed aggregation, llm_dedup_exact's
  * dedup), expressed as incremental plans over an unbounded events
  * stream — `readStream` -> transform -> `writeStream`, watermarks
  * bounding state, `flatMapGroupsWithState` for custom per-key state.
  *
  * Every transform here takes/returns streaming Datasets, so callers
  * compose them with any source (file/parquet directory via
  * `spark.readStream.schema(...).parquet(dir)`, Kafka, or MemoryStream
  * in tests) and any sink. State stores shard by key across executors —
  * the streaming twin of the batch shuffle — so these scale with
  * executor count like the batch plans do.
  */
object EventsStream {

  final case class Event(
      event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: java.sql.Timestamp)

  final case class UserRunning(
      user_id: Long, n_events: Long, total_value: Double)

  /** Unbounded stream of events from a growing parquet directory.
    *
    * `maxFilesPerTrigger` bounds (or, set high, effectively unbounds)
    * each micro-batch. Callers whose correctness depends on event-time
    * ordering across batches must size it deliberately: the file source
    * does NOT replay files in event-time order, so a watermarked stateful
    * op (e.g. [[dedup]]) seeing late files in a later micro-batch may
    * have already evicted the state those events need.
    */
  def readEvents(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP")
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  /** Tumbling daily windows per event type; watermark bounds the window
    * state to ~1 day of late data (batch twin: q15_event_windows).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      // +1e-6 nudge (repo rounding convention, r8 — the last two raw
      // round(sum) sites): the incremental sum accumulates in arrival
      // order while a batch oracle sums in arbitrary order, so a ulp
      // difference at a .xx5 boundary could flip the rounded digit;
      // the shared epsilon shifts both engines off the tie.
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")) + lit(1e-6), 2).as("total_value"))
      .select(col("win.start").as("day"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming twin of llm_dedup_exact (state: one key per id seen,
    * dropped once the watermark passes). `delay` is the dedup horizon:
    * a duplicate arriving within `delay` of its twin's event time is
    * always caught; size it to the source's worst-case arrival skew
    * (for a file source replaying in event-time order, the per-file
    * event-time span).
    */
  def dedup(events: DataFrame, delay: String = "1 day"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Session windows, streamed: same 30-minute-gap sessionization as the
    * batch q24, as an incremental stateful aggregation — session state
    * merges as events arrive and is bounded by the watermark. State
    * shards by (user, session) across executors like every stateful op
    * here.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      // +1e-6 nudge: see windowedCounts
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")) + lit(1e-6), 2).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Stream-stream interval join: errors correlated with the same user's
    * clicks in the preceding hour — both sides are unbounded streams, so
    * Spark buffers each side's rows in join state and the watermarks
    * plus the time-range condition bound how long: a click older than
    * (watermark - 1 hour) can never match a future error and its state
    * is evicted. Inner-join matches emit as soon as both rows have
    * arrived (no finalization wait). The streaming twin of the q23
    * batch range join.
    */
  def intervalJoin(errors: DataFrame, clicks: DataFrame,
      delay: String = "1 day"): DataFrame = {
    val e = errors.withWatermark("ts", delay)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    e.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("ts"))
  }

  /** Stream-static enrichment join — the streaming dimension join every
    * event pipeline needs: each micro-batch inner-joins the static
    * (slowly-changing) dimension frame, planned as a broadcast hash join
    * per batch — no streaming state, no watermark, and the stream side
    * never shuffles. Re-reading the dimension per batch is the
    * stream-static contract (a dimension update is picked up by the next
    * batch).
    */
  def enriched(
      events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events(eventKey) === dim(dimKey))

  /** Running per-user counters via flatMapGroupsWithState — the
    * incremental form of the feature-store query: each micro-batch folds
    * its events into per-user state and emits the updated feature row.
    * Use with OutputMode.Update.
    */
  def runningUserFeatures(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var s = prev.total_value
          batch.foreach { e => n += 1; s += e.value }
          val next = UserRunning(user, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }
}
