package graft.queries

import org.apache.spark.sql.functions._

/** Source/sink formats beyond parquet: CSV, JSON-lines and ORC
  * round-trips (engine writes the format, reads it back, aggregates).
  * CSV/JSON oracles re-read the SAME files with DuckDB; ORC has no
  * DuckDB reader, so its oracle reads a parquet twin of the same source
  * frame — a hash match then proves ORC round-trip fidelity.
  */
object FormatQueries {

  // Keyed by scale dir: the oracle re-reads these files after the whole
  // verify run ends, so a bench run at another sf must not overwrite them.
  private def root(dir: String): String =
    s"/root/repo/target/fmt/${java.nio.file.Paths.get(dir).getFileName}"

  // The oracle SQL strings are static (driver contract: SparkEntry
  // .oracleSql is a plain Map) and pinned to the driver's verify scale.
  private val OracleRoot = "/root/repo/target/fmt/sf0.01"

  /** The engine side writes under `root(dir)` for any dir (Bench runs
    * these at sf0.1 without clobbering verify outputs), but a VERIFY run
    * at a dir the static oracle doesn't point at would silently compare
    * stale/missing sf0.01 files — fail loudly instead. Verify.main sets
    * the `graft.verify` property.
    */
  private def checkedRoot(dir: String): String = {
    val r = root(dir)
    if (sys.props.contains("graft.verify") && r != OracleRoot)
      throw new IllegalStateException(
        s"fmt_* oracle SQL is pinned to $OracleRoot but verify is running against $dir; " +
          "running the compare would silently read stale files")
    r
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("fmt_csv_roundtrip",
      (s, dir) => {
        val p = s"${checkedRoot(dir)}/nation_csv"
        QueryDef.table(s, dir, "nation")
          .write.mode("overwrite").option("header", "true").csv(p)
        s.read
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT, n_comment STRING")
          .option("header", "true").csv(p)
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
      },
      Some(s"""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
              |FROM read_csv('/root/repo/target/fmt/sf0.01/nation_csv/*.csv', header=true)
              |GROUP BY n_regionkey""".stripMargin)),

    QueryDef("fmt_json_roundtrip",
      (s, dir) => {
        val p = s"${checkedRoot(dir)}/docs_json"
        QueryDef.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").json(p)
        s.read.schema("doc_id LONG, lang STRING, n_chars LONG").json(p)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      },
      Some(s"""SELECT lang, count(*) AS n_docs,
              | CAST(sum(n_chars) AS BIGINT) AS sum_chars
              |FROM read_json_auto('/root/repo/target/fmt/sf0.01/docs_json/*.json')
              |GROUP BY lang""".stripMargin)),

    // zstd-compressed parquet sink (the reference's DuckDB sink codec,
    // impl/duckdb_case-when.py:123) — oracle re-reads the zstd files.
    QueryDef("fmt_parquet_zstd",
      (s, dir) => {
        val p = s"${checkedRoot(dir)}/orders_zstd"
        QueryDef.table(s, dir, "orders")
          .write.mode("overwrite").option("compression", "zstd").parquet(p)
        s.read.parquet(p)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")) + lit(1e-6), 2).as("total"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             | round(sum(o_totalprice) + 1e-6, 2) AS total
             |FROM read_parquet('/root/repo/target/fmt/sf0.01/orders_zstd/*.parquet')
             |GROUP BY o_orderpriority""".stripMargin)),

    // ORC is Spark-native; DuckDB can't read ORC, so the same source
    // frame is also written as a parquet twin and the oracle aggregates
    // THAT — the engine aggregates the read-back ORC, so a hash match
    // proves the ORC write+read round trip preserved every value.
    QueryDef("fmt_orc_roundtrip",
      (s, dir) => {
        val p = s"${checkedRoot(dir)}/orders_orc"
        val twin = s"${checkedRoot(dir)}/orders_orc_twin"
        val src = QueryDef.table(s, dir, "orders")
        src.write.mode("overwrite").orc(p)
        src.write.mode("overwrite").parquet(twin)
        s.read.orc(p)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")) + lit(1e-6), 2).as("total"))
      },
      Some(s"""SELECT o_orderstatus, count(*) AS n,
              | round(sum(o_totalprice) + 1e-6, 2) AS total
              |FROM read_parquet('$OracleRoot/orders_orc_twin/*.parquet')
              |GROUP BY o_orderstatus""".stripMargin)),

    // Bucketed tables — the co-located-join lever: both fact tables are
    // written bucketBy(8, <orderkey>) sortBy(<orderkey>) as external
    // tables, so every later equi-join on the key plans with ZERO
    // shuffle exchanges below the join (bucketing IS the exchange, paid
    // once at write; FormatSpec pins the exchange-free plan). At 100 TB
    // this converts the nightly fact-to-fact join from a full two-sided
    // shuffle into a local per-bucket merge. The oracle re-reads the
    // bucketed files, proving the bucketed write round-trips values.
    QueryDef("fmt_bucketed_join",
      (s, dir) => {
        val r = checkedRoot(dir)
        s.sql("CREATE DATABASE IF NOT EXISTS graft_fmt")
        QueryDef.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$r/orders_bucketed")
          .saveAsTable("graft_fmt.orders_bucketed")
        QueryDef.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$r/lineitem_bucketed")
          .saveAsTable("graft_fmt.lineitem_bucketed")
        s.table("graft_fmt.orders_bucketed")
          .join(s.table("graft_fmt.lineitem_bucketed"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")) + lit(1e-6), 2).as("revenue"))
      },
      Some(s"""SELECT o_orderpriority, count(*) AS n_items,
              | round(sum(l_extendedprice) + 1e-6, 2) AS revenue
              |FROM read_parquet('$OracleRoot/orders_bucketed/*.parquet') o
              |JOIN read_parquet('$OracleRoot/lineitem_bucketed/*.parquet') l
              | ON o.o_orderkey = l.l_orderkey
              |GROUP BY o_orderpriority""".stripMargin)),

    // Z-ORDER layout maintenance (sources/ZOrder): events rewritten as
    // 8 Morton-ordered files over (user_id, ts) so min/max footer stats
    // prune box queries on EITHER dimension — the OPTIMIZE ZORDER of
    // lakehouse maintenance. The engine emits the read-back rows with
    // the zval each row was PLACED by; the oracle re-reads the same
    // files and recomputes the z-value from scratch (grid normalize in
    // f64, interleave with shifts/ORs — ZOrder.zSql is the exact SQL
    // twin), so a hash match proves both round-trip fidelity and the
    // Morton math. ZOrderSpec separately audits the layout claim
    // (disjoint per-file z ranges, per-file spans of BOTH dims far
    // below the global range).
    QueryDef("fmt_zorder_layout",
      (s, dir) => {
        val p = s"${checkedRoot(dir)}/events_zorder"
        graft.sources.ZOrder.write(
          QueryDef.table(s, dir, "events")
            .select(col("event_id"), col("user_id"),
              col("ts").cast("long").as("ts_sec"), col("value")),
          Seq("user_id", "ts_sec"), bits = 12, p, files = 8)
        s.read.parquet(p)
          .filter(pmod(col("user_id"), lit(11)) === 0)
          .select(col("event_id"), col("user_id"), col("ts_sec"), col("zval"))
      },
      Some(s"""WITH z AS (
              |  SELECT * FROM read_parquet('$OracleRoot/events_zorder/*.parquet')),
              |st AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
              |  min(ts_sec) AS mnt, max(ts_sec) AS mxt FROM z)
              |SELECT event_id, user_id, ts_sec,
              | CAST(${graft.sources.ZOrder.zSql(Seq("user_id", "ts_sec"),
                  Seq("mnu", "mnt"), Seq("mxu", "mxt"), 12)} AS BIGINT) AS zval
              |FROM z, st WHERE user_id % 11 = 0""".stripMargin))
  )
}
