package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-index claims, pinned: (1) searching the
  * [[Embeddings.writeIvfIndex]] layout is result-identical to the
  * recompute-everything [[Embeddings.ivfTopK]]; (2) appending a shard
  * against the frozen codebook ([[Embeddings.appendIvfShard]]) yields
  * searches identical to a full rebuild; (3) rebuild-into-place works
  * across catalog drops (external tables, the dedup-index lesson).
  */
class EmbIndexSpec extends AnyFunSuite with SparkSpec {

  private val db = "graft_ann_spec"
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val centroids = {
    import org.apache.spark.sql.DataFrame
    val seeds: DataFrame = emb.filter(col("vec_id") < 8)
    Embeddings.centroidsFromMeans(
      Embeddings.centroidUpdate(
        Embeddings.assignClusters(emb, seeds, "vec_id", "embedding"),
        emb, "vec_id", "embedding")
        .select(col("cluster_id"), col("pos"),
          (round(col("mean") + lit(1e-6), 4) + lit(0.0)).as("mean")),
      "vec_id", "embedding")
  }
  private def queries = emb.filter(col("vec_id") < 20)

  private def search(name: String) =
    Embeddings.ivfIndexedTopK(spark, name, queries,
      "vec_id", "embedding", nprobe = 3, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))

  test("indexed search equals the recompute-everything ivfTopK") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val name = s"$db.full"
    Embeddings.writeIvfIndex(emb, centroids, "vec_id", "embedding",
      name, "/root/repo/target/emb_index_spec/full", buckets = 4)
    val direct = Embeddings.ivfTopK(emb, queries, centroids,
        "vec_id", "embedding", nprobe = 3, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    val indexed = search(name)
    assert(indexed.exceptAll(direct).isEmpty && direct.exceptAll(indexed).isEmpty,
      "persisted layout must reproduce the direct search row for row")
    assert(indexed.count() > 0, "fixture must exercise real results")
  }

  test("append against the frozen codebook equals a full rebuild") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val full = s"$db.rebuild"
    Embeddings.writeIvfIndex(emb, centroids, "vec_id", "embedding",
      full, "/root/repo/target/emb_index_spec/rebuild", buckets = 4)
    val incr = s"$db.incr"
    Embeddings.writeIvfIndex(emb.filter(col("vec_id") % 10 =!= 0), centroids,
      "vec_id", "embedding",
      incr, "/root/repo/target/emb_index_spec/incr", buckets = 4)
    Embeddings.appendIvfShard(spark, incr,
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding")
    val a = search(full); val b = search(incr)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "append must be indistinguishable from a rebuild")
    // the shard really landed in the lists, not just the result set
    assert(spark.table(s"${incr}_lists").count() == emb.count())
  }

  test("rebuild-into-place survives a catalog drop (external tables)") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val name = s"$db.restart"
    val root = "/root/repo/target/emb_index_spec/restart"
    Embeddings.writeIvfIndex(emb, centroids, "vec_id", "embedding",
      name, root, buckets = 4)
    // simulate the restarted-JVM state: catalog forgets, directory stays
    spark.sql(s"DROP TABLE ${name}_lists")
    spark.sql(s"DROP TABLE ${name}_centroids")
    Embeddings.writeIvfIndex(emb, centroids, "vec_id", "embedding",
      name, root, buckets = 4)
    assert(search(name).count() > 0)
  }
}
