package graft.tools

import graft.GraftSession
import graft.streaming.EventsStream
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Scoped state-store A/B for the two checkpoint-commit-bound multi-batch
  * streaming gates (VERDICT r7 "Next round" #4): `stream_interval_join_mb`
  * and `stream_dedup_mb` spend most of their wall time in 6–12 state-store
  * commit cycles against local-FS checkpoints. This tool runs the exact
  * gate pipelines under three per-query state-store configurations —
  *
  *   - `hdfs`     : HDFSBackedStateStoreProvider (the suite default),
  *   - `rocksdb`  : RocksDBStateStoreProvider,
  *   - `rocksdb_cl`: RocksDB + changelog checkpointing (commits upload a
  *                   changelog instead of snapshotting the full store),
  *
  * interleaved A/B/C × reps inside ONE session/window so the comparison
  * is same-regime (SCALE.md noise methodology — these gates ride the
  * fsync-latency axis, which is only comparable within a session). The
  * provider is a per-query setting captured from the session conf at
  * stream start; each run gets a fresh checkpoint dir, so arms never
  * share state format. Output-row counts are asserted identical across
  * arms — the store backend must not change results.
  *
  * Emits one JSON line per run and writes the set to
  * docs/bench/STATESTORE_AB_r08.jsonl. Adoption rule (VERDICT r7 #4):
  * flip a gate's provider only if the winning arm is >=1.3x in-window.
  */
object StateStoreAB {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val spark = GraftSession.build(GraftSession.cpus, "graft-statestore-ab")
    spark.sparkContext.setLogLevel("WARN")

    val srcJoin = graft.queries.StreamingQueries.stageOrderedSource(
      spark, sfDir, "ssjoinmb", copies = 1)
    val srcDedup = graft.queries.StreamingQueries.stageOrderedSource(
      spark, sfDir, "dedupmb", copies = 2)

    def intervalJoinDf(): DataFrame = {
      val all = EventsStream.readEvents(spark, srcJoin, maxFilesPerTrigger = Some(1))
      EventsStream.intervalJoin(
        all.filter(col("event_type") === "error"),
        all.filter(col("event_type") === "click"),
        delay = "7 days")
    }
    def dedupDf(): DataFrame =
      EventsStream.dedup(
        EventsStream.readEvents(spark, srcDedup, maxFilesPerTrigger = Some(1)),
        delay = "7 days")

    var runId = 0
    def run(pipeline: String, df: => DataFrame, arm: String): (Double, Long) = {
      runId += 1
      val name = s"ab_${pipeline}_$runId"
      arm match {
        case "hdfs" =>
          spark.conf.unset(ProviderKey); spark.conf.unset(ChangelogKey)
        case "rocksdb" =>
          spark.conf.set(ProviderKey, RocksDB); spark.conf.set(ChangelogKey, "false")
        case "rocksdb_cl" =>
          spark.conf.set(ProviderKey, RocksDB); spark.conf.set(ChangelogKey, "true")
      }
      val t0 = System.nanoTime()
      val q = df.writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          s"/root/repo/target/stream_chk/$name-${System.nanoTime()}")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = spark.table(name).count()
      spark.conf.unset(ProviderKey); spark.conf.unset(ChangelogKey)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      (secs, n)
    }

    val arms = Seq("hdfs", "rocksdb", "rocksdb_cl")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val countsSeen = scala.collection.mutable.Map[String, Long]()
    for (rep <- 1 to reps; arm <- arms;
         (pipeline, df) <- Seq(
           "interval_join_mb" -> (() => intervalJoinDf()),
           "dedup_mb" -> (() => dedupDf()))) {
      val (secs, n) = run(pipeline, df(), arm)
      countsSeen.get(pipeline) match {
        case Some(prev) => require(prev == n,
          s"$pipeline rows differ across arms: $prev vs $n under $arm — ABORT")
        case None => countsSeen(pipeline) = n
      }
      val line = s"""{"pipeline":"$pipeline","arm":"$arm","rep":$rep,""" +
        s""""secs":${f"$secs%.3f"},"rows":$n,"sf":"$sfDir"}"""
      println(line)
      lines += line
    }
    Files.createDirectories(Paths.get("/root/repo/docs/bench"))
    Files.writeString(Paths.get("/root/repo/docs/bench/STATESTORE_AB_r08.jsonl"),
      lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
