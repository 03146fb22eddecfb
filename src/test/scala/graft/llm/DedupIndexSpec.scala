package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed dedup-index claims, pinned: (1) the bucketed path is
  * result-identical to [[Dedup.incrementalPairs]], and (2) the index
  * side of the ingest-time band join and the index band census both
  * plan with ZERO shuffle exchanges — the write-time bucketing is the
  * exchange, paid once per index build instead of once per daily
  * ingest.
  */
class DedupIndexSpec extends AnyFunSuite with SparkSpec {

  private val name = "graft_dedup_spec.sig_idx"

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val built: Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_dedup_spec")
    Dedup.writeBandedIndex(
      Dedup.signatureIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text"),
      name, "/root/repo/target/dedup_index_spec", buckets = 8)
  }

  test("bucketed incremental pairs equal the union-based incremental pairs") {
    built
    val shard = docs.filter(col("doc_id") % 10 === 0)
    val viaUnion = Dedup.incrementalPairs(
      Dedup.signatureIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text"),
      shard, "doc_id", "text")
    val viaBucket = Dedup.incrementalPairsBucketed(
      spark, name, shard, "doc_id", "text")
    try {
      assert(viaBucket.exceptAll(viaUnion).isEmpty
          && viaUnion.exceptAll(viaBucket).isEmpty,
        "bucketed path must be result-identical")
      assert(viaUnion.count() > 0, "fixture must exercise real pairs")
    } finally { viaUnion.unpersist(); viaBucket.unpersist() }
  }

  test("bucketed index build writes at most one file per bucket (no task x bucket sprawl)") {
    built
    // r8: both writes repartition onto the writer's bucket-id expression
    // before bucketBy, so each bucket is written by exactly one task —
    // without it every write task emits a file into each bucket it
    // touches (tasks x buckets small files; guide §6).
    val bandFiles = graft.sources.TableMaintenance.dataFileCount(spark, s"${name}_bands")
    val sigFiles = graft.sources.TableMaintenance.dataFileCount(spark, s"${name}_sigs")
    assert(bandFiles <= 8, s"bands table has $bandFiles files for 8 buckets")
    assert(sigFiles <= 8, s"sigs table has $sigFiles files for 8 buckets")
  }

  test("index band census aggregates with zero exchanges") {
    built
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val census = spark.table(s"${name}_bands")
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
      val exchanges = census.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed census must not shuffle:\n${census.queryExecution.executedPlan}")
      assert(census.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ingest band join never shuffles the index side") {
    built
    // force the sort-merge path (a broadcast shard would make the claim
    // vacuously true) and disable AQE (opaque wrapper, as in FormatSpec)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shardBands = Dedup.signatureIndex(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        .select(col("id"),
          explode(TextFunctions.lshBandKeysFromSig(col("sig"), 6, 2)).as("band"))
      val joined = shardBands.as("s")
        .join(spark.table(s"${name}_bands").as("i"),
          col("s.band") === col("i.band"))
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge join:\n$plan")
      val exchangesBelow = smj.get.collect { case e: ShuffleExchangeExec => e }
      assert(exchangesBelow.size == 1,
        s"only the shard side may shuffle:\n${smj.get}")
      val indexSideShuffled = exchangesBelow.head.collectLeaves()
        .exists(_.toString.contains("sig_idx_bands"))
      assert(!indexSideShuffled,
        s"the exchange must sit on the shard side:\n${smj.get}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
