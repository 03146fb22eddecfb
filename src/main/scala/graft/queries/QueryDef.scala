package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan over the parquet tables under
  * `dir`, plus (when SQL-expressible) an equivalent DuckDB oracle on the
  * same tables. Column names must match the oracle exactly — the driver
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  /** Read one testdata table (TESTDATA.md: one parquet file per table). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright. Read nanos as long and convert with exact
    * integer arithmetic to a micros timestamp (DuckDB's ns->us cast
    * truncates identically, so oracle comparisons stay bit-equal).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
