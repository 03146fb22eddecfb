package graft.features

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plans, not just answers: the properties that make the strategies hold
  * at 100 TB — filter pushdown into the scan, column pruning, and exactly
  * one shuffle for the agg strategies — asserted on the compiled physical
  * plan so a regression shows up as a test failure, not a slow cluster.
  */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private lazy val dataPath: String = {
    val p = "/root/repo/target/test_planshape_trx"
    if (!new java.io.File(s"$p/_SUCCESS").exists())
      graft.datagen.DataGen.write(spark, graft.datagen.DataGen.Config(50L, 3, 5), p)
    p
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("time-window filter is pushed into the parquet scan") {
    val df = CaseWhenStrategy(spark.read.parquet(dataPath), FeatureSpec.reference)
    // CaseWhenStrategy itself has no pre-filter; PivotRollup does.
    val p = plan(PivotRollupStrategy(spark.read.parquet(dataPath), FeatureSpec.reference))
    assert(p.contains("PushedFilters: [IsNotNull(t_minus), LessThanOrEqual(t_minus,720)]"),
      s"expected t_minus<=720 pushed to scan;\n$p")
    assert(df != null)
  }

  test("column pruning reaches the scan (part_col and nothing else dropped)") {
    for (strat <- Seq[FeatureStrategy](CaseWhenStrategy, PivotRollupStrategy, MapGroupsStrategy)) {
      val p = plan(strat(spark.read.parquet(dataPath), FeatureSpec.reference))
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("part_col"),
        s"${strat.getClass.getSimpleName}: partition col must not be read")
    }
  }

  test("agg strategies shuffle exactly once (partial+final HashAggregate)") {
    for (strat <- Seq[FeatureStrategy](CaseWhenStrategy, PivotRollupStrategy)) {
      val p = plan(strat(spark.read.parquet(dataPath), FeatureSpec.reference))
      val exchanges = p.linesIterator.count(_.trim.matches(".*Exchange hashpartitioning.*"))
      assert(exchanges == 1,
        s"${strat.getClass.getSimpleName}: expected 1 shuffle, found $exchanges")
    }
  }

  test("relational q2 filter+projection push down to the scan") {
    val df = graft.queries.QueryDef.table(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_quantity") > lit(45.0))
      .select(col("l_orderkey"), col("l_quantity"))
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity,45.0)"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice"))
  }
}
