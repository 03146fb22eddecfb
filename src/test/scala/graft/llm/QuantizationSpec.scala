package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the vector-compression operators: the SQ8 grid bound
  * (reconstruction error ≤ half a grid cell), PQ code-domain sanity, and
  * the load-bearing search identity — pqTopK with a full-corpus
  * shortlist IS the exact top-k (the shortlist is the only
  * approximation; the re-rank is exact).
  */
class QuantizationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("sq8: codes stay in [0, 255] and reconstruction error is within half a grid cell") {
    val enc = Quantization.sq8Encode(emb, "vec_id", "embedding")
    val checked = enc.select(
      aggregate(col("codes"), lit(true),
        (a, c) => a && c >= 0L && c <= 255L).as("in_range"),
      // err_i <= (hi_i - lo_i)/255/2 + ulp slack, per component
      aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")),
          sequence(lit(0), lit(63)),
          (x, i) => {
            val lo = element_at(col("lo_arr"), i + 1)
            val hi = element_at(col("hi_arr"), i + 1)
            val c = element_at(col("codes"), i + 1)
            abs(x - (lo + (c.cast("double") * (hi - lo)) / lit(255.0))) <=
              (hi - lo) / lit(255.0) / lit(2.0) + lit(1e-12)
          }),
        lit(true), (a, x) => a && x).as("err_ok"))
    val rows = checked.agg(
      count(lit(1)).as("n"),
      sum(when(col("in_range") && col("err_ok"), 0).otherwise(1)).as("bad"))
      .head()
    assert(rows.getLong(0) == 500L)
    assert(rows.getLong(1) == 0L, "every vector within code range and error bound")
  }

  test("sq8: decode of extreme codes recovers the grid endpoints") {
    val grid = Quantization.sq8GridRow(Quantization.sq8Grid(emb, "embedding"))
    val r = grid.select(
      Quantization.sq8Decode(
        array_repeat(lit(0L), 64), col("lo_arr"), col("hi_arr")).as("at0"),
      Quantization.sq8Decode(
        array_repeat(lit(255L), 64), col("lo_arr"), col("hi_arr")).as("at255"),
      col("lo_arr"), col("hi_arr")).head()
    assert(r.getSeq[Double](0) == r.getSeq[Double](2), "code 0 decodes to lo")
    // lo + (255*(hi-lo))/255 can differ from hi by one rounding ulp
    val at255 = r.getSeq[Double](1); val hi = r.getSeq[Double](3)
    at255.zip(hi).foreach { case (a, h) => assert(math.abs(a - h) < 1e-12) }
  }

  test("pq: every (vector, subspace) gets one code from the codebook domain") {
    val cb = Quantization.pqCodebooks(emb, "vec_id", "embedding")
    val codes = Quantization.pqEncode(emb, cb, "vec_id", "embedding")
    val stats = codes.agg(
      count(lit(1)).as("n"),
      countDistinct(col("vec_id")).as("nv"),
      min(col("code")).as("lo"), max(col("code")).as("hi"),
      min(col("dist")).as("dlo")).head()
    assert(stats.getLong(0) == 500L * Quantization.DefaultM, "one row per (vector, subspace)")
    assert(stats.getLong(1) == 500L)
    assert(stats.getLong(2) >= 0L && stats.getLong(3) < Quantization.DefaultK.toLong)
    assert(stats.getDouble(4) >= 0.0, "squared-L2 residuals are non-negative")
    // codebook: at most m x k entries, every subvector dim-4
    val cbStats = cb.agg(count(lit(1)).as("n"),
      min(size(col("cv"))).as("sl"), max(size(col("cv"))).as("sh")).head()
    assert(cbStats.getLong(0) <= (Quantization.DefaultM * Quantization.DefaultK).toLong)
    assert(cbStats.getInt(1) == Quantization.DefaultSubDim)
    assert(cbStats.getInt(2) == Quantization.DefaultSubDim)
  }

  test("pq: a full-corpus shortlist makes pqTopK exactly the brute-force L2 top-k") {
    val q = emb.filter(col("vec_id") < 5)
    val cb = Quantization.pqCodebooks(emb, "vec_id", "embedding")
    val d = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))
    // same hoisted-identity distance the rerank computes, so fp ties
    // cannot order differently between reference and implementation
    val exact = Embeddings.topKPerQuery(
      emb.select(col("vec_id").as("neighbor_id"), d(col("embedding")).as("__cv"))
        .withColumn("__cvv", Embeddings.dot(col("__cv"), col("__cv")))
        .crossJoin(broadcast(
          q.select(col("vec_id").as("query_id"), d(col("embedding")).as("__qv"))
            .withColumn("__qvv", Embeddings.dot(col("__qv"), col("__qv")))))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          (lit(0.0) - (col("__qvv") + col("__cvv")
            - lit(2.0) * Embeddings.dot(col("__qv"), col("__cv")))).as("sim")), 3)
      .select($"query_id", $"neighbor_id", $"rnk")
    val viaPq = Quantization.pqTopK(emb, q, cb, "vec_id", "embedding",
        shortlist = 500, k = 3)
      .select($"query_id", $"neighbor_id", $"rnk")
    assert(viaPq.exceptAll(exact).isEmpty && exact.exceptAll(viaPq).isEmpty,
      "shortlist=corpus => ADC only orders the shortlist; exact re-rank decides")
  }

  test("ivfpq: probing every cell reduces to plain PQ search") {
    val q = emb.filter(col("vec_id") < 5)
    val cb = Quantization.pqCodebooks(emb, "vec_id", "embedding")
    val cells = Quantization.pqCodebooks(emb, "vec_id", "embedding",
      m = 1, subDim = 64, k = 4)
    val all = Quantization.ivfPqTopK(emb, q, cells, cb, "vec_id", "embedding",
      nprobe = 4, shortlist = 30, k = 3)
    val plain = Quantization.pqTopK(emb, q, cb, "vec_id", "embedding",
      shortlist = 30, k = 3)
    assert(all.exceptAll(plain).isEmpty && plain.exceptAll(all).isEmpty,
      "nprobe = cells => the IVF routing filters nothing")
  }

  test("pq: ADC shortlist ranking is reproducible and bounded per query") {
    val q = emb.filter(col("vec_id") < 5)
    val cb = Quantization.pqCodebooks(emb, "vec_id", "embedding")
    val res = Quantization.pqTopK(emb, q, cb, "vec_id", "embedding",
      shortlist = 20, k = 7)
    val counts = res.groupBy($"query_id").agg(count(lit(1)).as("n"),
      max($"rnk").as("mr")).collect()
    assert(counts.length == 5)
    counts.foreach { r =>
      assert(r.getLong(1) == 7L, "k rows per query")
      assert(r.getInt(2) == 7, "ranks are dense 1..k")
    }
    val again = Quantization.pqTopK(emb, q, cb, "vec_id", "embedding",
      shortlist = 20, k = 7)
    assert(res.exceptAll(again).isEmpty, "deterministic end to end")
  }
}
