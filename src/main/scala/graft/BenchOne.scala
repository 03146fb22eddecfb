package graft
import graft.datagen.DataGen
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(32, "benchone")
    spark.sparkContext.setLogLevel("WARN")
    val p = "/root/repo/target/refdata/medium"
    var t0 = System.nanoTime()
    queries.RefWorkload.ensure(spark, DataGen.Medium, p)
    println(f"RESULT datagen_medium ${(System.nanoTime()-t0)/1e9}%.2f s")
    for ((n, s) <- Seq("pivot" -> features.PivotRollupStrategy, "aggregator" -> features.AggregatorStrategy)) {
      t0 = System.nanoTime()
      s(spark.read.parquet(p), features.FeatureSpec.reference)
        .write.mode("overwrite").parquet("/root/repo/target/bench_scratch/out_med")
      println(f"RESULT medium_$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
