package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-join claim, pinned: with both sides bucketed on the
  * join key, the equi-join must plan WITHOUT a shuffle exchange on
  * either side — the write-time bucketing is the exchange.
  */
class FormatSpec extends AnyFunSuite with SparkSpec {

  test("bucketed fact-to-fact join plans with zero exchanges below the join") {
    val dir = "/root/testdata/sf0.001"
    val root = "/root/repo/target/fmt_spec"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_fmt_spec")
    QueryDef.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$root/orders_b").saveAsTable("graft_fmt_spec.orders_b")
    QueryDef.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$root/lineitem_b").saveAsTable("graft_fmt_spec.lineitem_b")

    // force the sort-merge path (at this sf a broadcast join would make
    // the bucketing claim vacuously true) and disable AQE (its wrapper
    // node is opaque to collect, same pattern as PlanShapeSpec)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("graft_fmt_spec.orders_b")
        .join(spark.table("graft_fmt_spec.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge join:\n$plan")
      val exchangesBelow = smj.get.collect { case e: ShuffleExchangeExec => e }
      assert(exchangesBelow.isEmpty,
        s"bucketed join must not shuffle either side:\n${smj.get}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
