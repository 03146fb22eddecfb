package graft

import graft.features.{CaseWhenStrategy, FeatureSpec}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers here as a named query over the
  * parquet tables in `dir`, with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    RelationalQueries.defs ++ FeatureQueries.defs ++ RefWorkload.defs ++
      LlmQueries.defs ++ MultimodalQueries.defs ++ FormatQueries.defs ++
      StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's feature-generation query (case-when strategy)
    * instantiated on the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    FeatureQueries.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
