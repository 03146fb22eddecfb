package graft.queries

import graft.datagen.DataGen
import graft.features._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's actual benchmark workload, end-to-end: generate the
  * reference-shaped transactions table (graft.datagen.DataGen — S4/S5),
  * then build the full 2,080-column feature-store partition
  * (FeatureSpec.reference) with each of the three strategies, each
  * hash-checked against a DuckDB oracle that reads the SAME generated
  * parquet via `read_parquet` (reference impl/pyspark-case-when.py:100-131,
  * impl/pyspark-pivot.py:185-189, impl/pyspark-pandas-udf.py:147-151).
  *
  * The correctness gate runs on [[DataGen.VerifySlice]] (~0.7M rows) so
  * three 2,080-expression DuckDB oracle evaluations stay cheap; Bench runs
  * the same code on [[DataGen.Tiny]] (~17M rows) against BASELINE.md.
  * Amounts are dyadic (DataGen doc), so every sum is order-independent and
  * bit-exact across Spark / DuckDB / imperative JVM code.
  */
object RefWorkload {

  /** Generated data lives under the build dir — never outside the repo. */
  val dataRoot: String =
    sys.env.getOrElse("GRAFT_DATA_DIR", "/root/repo/target/refdata")

  def slicePath: String = s"$dataRoot/verify_slice"
  def tinyPath: String = s"$dataRoot/tiny"

  /** Generate once, reuse across queries/runs (output is deterministic, so
    * an existing _SUCCESS marker means the data is already right).
    */
  def ensure(spark: SparkSession, cfg: DataGen.Config, path: String): String =
    synchronized {
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        DataGen.write(spark, cfg, path)
      path
    }

  private val Round = 4

  private def strategyQuery(name: String, strategy: FeatureStrategy): QueryDef =
    QueryDef(name,
      (s, _) => {
        val path = ensure(s, DataGen.VerifySlice, slicePath)
        QueryDef.roundForOracle(
          strategy(s.read.parquet(path), FeatureSpec.reference),
          FeatureSpec.reference, Round)
      },
      // MATERIALIZED: with the 2,080-aggregate GROUP BY fused directly
      // onto the multi-file parquet scan, DuckDB 32-thread execution
      // over-allocates and dies (reproducible "Failed to allocate block"
      // even with 126 GB free); materializing the scan first keeps the
      // oracle comfortably in memory.
      Some(s"WITH __src AS MATERIALIZED (SELECT * FROM " +
        s"read_parquet('$slicePath/**/*.parquet')) " +
        FeatureSpec.reference.toOracleSql("__src", Round)))

  /** Generator distribution check as an oracle-backed query: both engines
    * aggregate the parquet DataGen wrote, so the partitioned sink (S4),
    * partition discovery, and the generator's category/amount marginals
    * are all pinned by the same hash compare.
    */
  private val datagenStats: QueryDef = QueryDef("ref_datagen_stats",
    (s, _) => {
      val path = ensure(s, DataGen.VerifySlice, slicePath)
      s.read.parquet(path)
        .groupBy(col("card_type"), col("channel"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("customer_id")).as("n_customers"),
          countDistinct(col("trx_type")).as("n_trx_types"),
          countDistinct(col("part_col")).as("n_parts"),
          round(avg(col("trx_amnt")) + lit(1e-6), 4).as("avg_amnt"),
          round(min(col("trx_amnt")), 4).as("min_amnt"),
          round(max(col("trx_amnt")), 4).as("max_amnt"),
          min(col("t_minus")).as("min_t"),
          max(col("t_minus")).as("max_t"))
    },
    Some(s"""SELECT card_type, channel, count(*) AS n_rows,
            | count(DISTINCT customer_id) AS n_customers,
            | count(DISTINCT trx_type) AS n_trx_types,
            | count(DISTINCT part_col) AS n_parts,
            | round(avg(trx_amnt) + 0.000001, 4) AS avg_amnt,
            | round(min(trx_amnt), 4) AS min_amnt,
            | round(max(trx_amnt), 4) AS max_amnt,
            | min(t_minus) AS min_t, max(t_minus) AS max_t
            |FROM read_parquet('$slicePath/**/*.parquet', hive_partitioning=1)
            |GROUP BY card_type, channel""".stripMargin))

  /** S2 — glob scan: read a path pattern, not a discovered root. */
  private val globScan: QueryDef = QueryDef("ref_glob_scan",
    (s, _) => {
      val path = ensure(s, DataGen.VerifySlice, slicePath)
      s.read.parquet(s"$path/part_col=partition_*")
        .groupBy(col("t_minus"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("customer_id")).as("n_customers"))
    },
    Some(s"""SELECT t_minus, count(*) AS n_rows,
            | count(DISTINCT customer_id) AS n_customers
            |FROM read_parquet('$slicePath/part_col=partition_*/*.parquet')
            |GROUP BY t_minus""".stripMargin))

  val defs: Seq[QueryDef] = Seq(
    strategyQuery("ref_trx_casewhen", CaseWhenStrategy),
    strategyQuery("ref_trx_pivot", PivotRollupStrategy),
    strategyQuery("ref_trx_mapgroups", MapGroupsStrategy),
    strategyQuery("ref_trx_aggregator", AggregatorStrategy),
    // The engine-chosen strategy (AutoStrategy routes the 2,080-wide
    // reference spec to AggregatorStrategy) — same oracle as the rest.
    strategyQuery("ref_trx_auto", AutoStrategy),
    datagenStats,
    globScan
  )
}
