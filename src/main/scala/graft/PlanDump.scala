package graft
import java.nio.file.{Files, Paths}
/** Regenerates docs/plans/<name>.txt — formatted physical plans of the four
  * feature strategies over reference-shaped data (committed as reviewable
  * evidence of the plan shapes PlanShapeSpec pins).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(8, "plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val path = queries.RefWorkload.ensure(spark, datagen.DataGen.VerifySlice,
      queries.RefWorkload.slicePath)
    Files.createDirectories(Paths.get("/root/repo/docs/plans"))
    spark.conf.set("spark.sql.maxMetadataStringLength", "200")
    for ((name, strat) <- Seq(
        "aggregator" -> features.AggregatorStrategy,
        "pivot_rollup" -> features.PivotRollupStrategy,
        "case_when" -> features.CaseWhenStrategy,
        "map_groups" -> features.MapGroupsStrategy,
        "auto" -> features.AutoStrategy)) {
      val df = strat(spark.read.parquet(path), features.FeatureSpec.reference)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the 2,080-column lists don't aid review — keep the operator tree
      val trimmed = plan.linesIterator.map(l =>
        if (l.length > 300) l.take(297) + "..." else l).mkString("\n")
      Files.writeString(Paths.get(s"/root/repo/docs/plans/$name.txt"), trimmed)
      println(s"wrote $name")
    }
    spark.stop()
  }
}
