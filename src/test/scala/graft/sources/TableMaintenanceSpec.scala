package graft.sources

import graft.SparkSpec
import graft.llm.Embeddings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction's contract, pinned: results are untouched, the file count
  * actually shrinks to one-per-bucket, and the bucket layout (and every
  * exchange-free plan property it buys) survives the rewrite.
  */
class TableMaintenanceSpec extends AnyFunSuite with SparkSpec {

  private val db = "graft_maint_spec"
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val centroids = {
    val seeds: DataFrame = emb.filter(col("vec_id") < 8)
    Embeddings.centroidsFromMeans(
      Embeddings.centroidUpdate(
        Embeddings.assignClusters(emb, seeds, "vec_id", "embedding"),
        emb, "vec_id", "embedding")
        .select(col("cluster_id"), col("pos"),
          (round(col("mean") + lit(1e-6), 4) + lit(0.0)).as("mean")),
      "vec_id", "embedding")
  }

  private def search(name: String) =
    Embeddings.ivfIndexedTopK(spark, name, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", nprobe = 3, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))

  test("compaction shrinks an appended IVF lists table without changing results") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val name = s"$db.ivf"
    val root = "/root/repo/target/table_maint_spec/ivf"
    Embeddings.writeIvfIndex(emb.filter(col("vec_id") % 10 =!= 0), centroids,
      "vec_id", "embedding", name, root, buckets = 4)
    Embeddings.appendIvfShard(spark, name,
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding")
    val lists = s"${name}_lists"
    val before = TableMaintenance.dataFileCount(spark, lists)
    val expected = search(name).collect().toSet

    val oldLoc = TableMaintenance.compactBucketedTable(
      spark, lists, s"$root/lists_gen2")

    val after = TableMaintenance.dataFileCount(spark, lists)
    assert(after < before, s"compaction must merge files: $before -> $after")
    assert(after <= 4, s"one file per bucket at most: $after")
    assert(search(name).collect().toSet == expected,
      "compaction must be invisible to searches")
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(lists)).bucketSpec
    assert(spec.exists(s => s.numBuckets == 4 &&
        s.bucketColumnNames == Seq("cluster_id")),
      s"bucket spec must survive the rewrite: $spec")
    // the superseded generation is returned for caller-owned retention,
    // never deleted behind in-flight readers' backs
    assert(new java.io.File(new java.net.URI(oldLoc).getPath).exists())
  }

  test("compacted banded dedup index still aggregates its census exchange-free") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val name = s"$db.sig"
    val root = "/root/repo/target/table_maint_spec/sig"
    graft.llm.Dedup.writeBandedIndex(
      graft.llm.Dedup.signatureIndex(docs, "doc_id", "text"),
      name, root, buckets = 8)
    TableMaintenance.compactBucketedTable(
      spark, s"${name}_bands", s"$root/bands_gen2")
    val census = spark.table(s"${name}_bands")
      .groupBy(col("band")).agg(count(lit(1)).as("__n"))
    census.collect()
    val exchanges = census.queryExecution.executedPlan
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"band census must stay exchange-free after compaction:\n${census.queryExecution.executedPlan}")
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(s"${name}_bands")).bucketSpec
    assert(spec.exists(_.sortColumnNames == Seq("band")),
      s"sort columns must survive the rewrite: $spec")
  }

  test("compaction refuses non-bucketed tables and in-place rewrites") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val flat = s"$db.flat"
    emb.limit(10).write.mode("overwrite").format("parquet")
      .option("path", "/root/repo/target/table_maint_spec/flat")
      .saveAsTable(flat)
    intercept[IllegalArgumentException] {
      TableMaintenance.compactBucketedTable(
        spark, flat, "/root/repo/target/table_maint_spec/flat2")
    }
    val name = s"$db.inplace"
    val root = "/root/repo/target/table_maint_spec/inplace"
    Embeddings.writeIvfIndex(emb, centroids, "vec_id", "embedding",
      name, root, buckets = 4)
    intercept[IllegalArgumentException] {
      TableMaintenance.compactBucketedTable(spark, s"${name}_lists", s"$root/lists")
    }
  }
}
