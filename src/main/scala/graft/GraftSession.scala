package graft

import org.apache.spark.sql.SparkSession

/** One place that builds the engine's SparkSession with the settings every
  * entry point (Verify, Bench, tests) needs:
  *
  *   - `shuffle.partitions` sized to the core count, not the 200 default —
  *     on a real cluster this is per-job tuning, locally it avoids 200
  *     tiny tasks per exchange;
  *   - AQE on (runtime coalescing, skew-join splitting, broadcast demotion);
  *   - `nanosAsLong`: the driver's events.parquet stores TIMESTAMP(NANOS),
  *     which Spark's reader otherwise rejects (set once here, not inside a
  *     table reader — a conf flip per read is a global side effect);
  *   - UTC so date arithmetic matches the DuckDB oracle;
  *   - Kryo, matching the reference's Spark configs
  *     (reference impl/pyspark-case-when.py:86).
  */
object GraftSession {

  def build(cpus: Int, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // AggregatorStrategy runs as ObjectHashAggregate; the default
      // sort-based fallback after 128 distinct keys would defeat the hash
      // path for any real key count. 128k keys x ~17KB buffer ≈ 2 GB of
      // agg state per task ceiling before graceful sort-based fallback.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Core count for local runs: the driver exports SPARK_GRAFT_CPUS. */
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
}
