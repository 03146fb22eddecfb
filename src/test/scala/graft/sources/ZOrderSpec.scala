package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout claims, pinned on a worst-case-for-sorting frame:
  * two independent uniform dimensions (a plain sort would cluster one
  * and scatter the other). After [[ZOrder.write]]:
  * per-file z ranges are DISJOINT (range partitioning on the Morton
  * key), and per-file spans of BOTH dimensions are a fraction of the
  * global range — the property parquet footer pruning feeds on, for
  * box queries on either dimension.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  private val path = "/root/repo/target/zorder_spec/grid"

  // 64k rows over a 256x256 independent grid, arrival order hostile
  // (hash-scrambled), 16 output files
  private lazy val written: Array[java.io.File] = {
    val df = spark.range(0, 65536)
      .select(
        (xxhash64(col("id")) % 256 + 256) .cast("long").mod(256).as("a"),
        (xxhash64(col("id"), lit(1)) % 256 + 256).cast("long").mod(256).as("b"))
    ZOrder.write(df, Seq("a", "b"), bits = 8, path, files = 16)
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
  }

  private def fileStats(f: java.io.File) =
    spark.read.parquet(f.getAbsolutePath)
      .agg(min(col("zval")), max(col("zval")), min(col("a")), max(col("a")),
        min(col("b")), max(col("b")), count(lit(1)))
      .head()

  test("per-file z ranges are disjoint and ordered (range partitioning)") {
    val ranges = written.map(fileStats).map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(ranges.length >= 8, s"expected a multi-file layout: ${ranges.length}")
    for (Array(lo, hi) <- ranges.sliding(2))
      assert(lo._2 < hi._1,
        s"file z ranges must not overlap: ${lo._2} vs ${hi._1}")
  }

  test("per-file spans of BOTH dimensions are small vs the global range") {
    val stats = written.map(fileStats)
    val spanA = stats.map(r => (r.getLong(3) - r.getLong(2) + 1).toDouble / 256).sum / stats.length
    val spanB = stats.map(r => (r.getLong(5) - r.getLong(4) + 1).toDouble / 256).sum / stats.length
    // 16 files over a 2-D Morton curve: each file covers ~1/16 of the
    // AREA, so ~1/4 of EACH side (plus curve-boundary slop). A plain
    // sort by (a, b) would give spanB ≈ 1.0; assert both dims stay
    // well under half the range — the "prunes on either dimension"
    // property, with margin for boundary files.
    assert(spanA <= 0.55 && spanB <= 0.55,
      f"avg normalized spans a=$spanA%.3f b=$spanB%.3f — layout not clustering both dims")
  }

  test("the layout is a permutation: every row survives, zval matches its cells") {
    val z = spark.read.parquet(path)
    assert(z.count() == 65536)
    // recompute the Morton key from scratch and compare to placement
    val mn = z.agg(min(col("a")).as("mna"), max(col("a")).as("mxa"),
      min(col("b")).as("mnb"), max(col("b")).as("mxb"))
    val recomputed = z.crossJoin(broadcast(mn))
      .withColumn("__z2", ZOrder.zValue(Seq(
        ZOrder.gridCell(col("a"), col("mna"), col("mxa"), 8),
        ZOrder.gridCell(col("b"), col("mnb"), col("mxb"), 8)), 8))
    assert(recomputed.filter(col("zval") =!= col("__z2")).isEmpty,
      "written zval must equal the recomputed Morton key")
  }
}
