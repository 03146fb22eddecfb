package graft.features

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's null/zero matrix (SURVEY.md 2.7.3): count -> 0 and
  * sum -> 0.0 when nothing matches, avg/min/max -> NULL; NULL grouping
  * values match no tuple; rows beyond the largest window are invisible.
  */
class NullSemanticsSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("g", StringType, nullable = true),
    StructField("t", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)
  ))

  private val spec = FeatureSpec(
    keyCol = "k", valueCol = "v", timeCol = "t",
    windows = Seq(7, 30),
    groupings = Seq(GroupingFamily(Seq("g"), Seq(Seq("a"), Seq("b")))))

  private def run(strategy: FeatureStrategy, rows: Seq[Row]): Map[String, Any] = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = strategy(df, spec).collect().head
    spec.outputColumns.zip(out.toSeq).toMap
  }

  private val strategies =
    Seq(CaseWhenStrategy, PivotRollupStrategy, MapGroupsStrategy, AggregatorStrategy)

  test("no matching rows: count=0, sum=0.0, avg/min/max NULL") {
    for (s <- strategies) {
      val m = run(s, Seq(Row(1L, "b", 1L, 5.0)))
      assert(m("a_7d_count") == 0L, s"$s count")
      assert(m("a_7d_sum") == 0.0, s"$s sum")
      assert(m("a_7d_avg") == null, s"$s avg")
      assert(m("a_7d_min") == null, s"$s min")
      assert(m("a_7d_max") == null, s"$s max")
    }
  }

  test("matching rows with all-NULL values: count=n, sum=0.0, avg/min/max NULL") {
    for (s <- strategies) {
      val m = run(s, Seq(Row(1L, "a", 1L, null), Row(1L, "a", 2L, null)))
      assert(m("a_7d_count") == 2L, s"$s count")
      assert(m("a_7d_sum") == 0.0, s"$s sum")
      assert(m("a_7d_avg") == null, s"$s avg")
      assert(m("a_7d_min") == null, s"$s min")
    }
  }

  test("NULL grouping value matches no tuple") {
    for (s <- strategies) {
      val m = run(s, Seq(Row(1L, null, 1L, 5.0), Row(1L, "a", 2L, 3.0)))
      assert(m("a_7d_count") == 1L, s"$s count")
      assert(m("a_7d_sum") == 3.0, s"$s sum")
    }
  }

  test("rows beyond the largest window are invisible") {
    for (s <- strategies) {
      val m = run(s, Seq(Row(1L, "a", 31L, 5.0), Row(1L, "a", 2L, 3.0)))
      assert(m("a_30d_count") == 1L, s"$s count")
      assert(m("a_30d_sum") == 3.0, s"$s sum")
      assert(m("a_30d_max") == 3.0, s"$s max")
    }
  }

  test("window buckets roll up cumulatively with exact avg") {
    for (s <- strategies) {
      // one row in (0,7], one in (7,30]
      val m = run(s, Seq(Row(1L, "a", 5L, 2.0), Row(1L, "a", 20L, 4.0)))
      assert(m("a_7d_count") == 1L, s"$s 7d count")
      assert(m("a_7d_avg") == 2.0, s"$s 7d avg")
      assert(m("a_30d_count") == 2L, s"$s 30d count")
      assert(m("a_30d_avg") == 3.0, s"$s 30d avg (weighted, not mean-of-means)")
      assert(m("a_30d_min") == 2.0 && m("a_30d_max") == 4.0, s"$s 30d min/max")
    }
  }
}
