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
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong` is set at
    * session build (GraftSession does). Convert with exact integer
    * arithmetic to a micros timestamp (DuckDB's ns->us cast truncates
    * identically, so oracle comparisons stay bit-equal).
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))

  /** Verify-layer rounding of double feature columns for hash-stable
    * DuckDB comparison — NOT part of the feature API (the engine's public
    * answer is unrounded; only the oracle diff needs stable decimals).
    * The +1e-6 epsilon mirrors FeatureSpec.toOracleSql: it shifts
    * decimal-exact rounding ties (e.g. an avg landing on .xxxx5) off the
    * boundary, where Spark's string-based Round and DuckDB's
    * multiply-based round would otherwise disagree.
    */
  def roundForOracle(df: DataFrame, spec: graft.features.FeatureSpec, scale: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, round}
    val cols = col(spec.keyCol) +: spec.features.map { f =>
      f.agg match {
        case graft.features.AggKind.Count => col(f.name)
        case _ => round(col(f.name) + lit(1e-6), scale).as(f.name)
      }
    }
    df.select(cols: _*)
  }
}
