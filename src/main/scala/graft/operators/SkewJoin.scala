package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join splitting covers sorted
  * merge joins at runtime; these cover the cases AQE can't see — a
  * pathological hot key known in advance, or skewed aggregation state.
  */
object SkewJoin {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * random salt in [0, salts), the (small, broadcast-unfriendly but
    * replicable) right side is exploded `salts` times, and the join key
    * becomes (key, salt) — a hot key's rows spread over `salts`
    * partitions instead of one straggler task.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, salts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase skew-proof distinct-count per key: pre-aggregate on
    * (key, salt) to shrink hot keys map-side, then combine. Exact for
    * the algebraic aggs; shown here for count/sum.
    */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("sum_value"))
}
