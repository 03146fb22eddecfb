package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** The generic relational operator surface (SURVEY.md §2 inventory + §2.5's
  * "available built-in" extensions), each with a DuckDB oracle. Everything
  * here is stock `org.apache.spark.sql` — declarative plans that Catalyst
  * pushes down / prunes / reorders; no custom physical code (SURVEY.md §4).
  *
  * Doubles are rounded identically on both sides: float aggregation order
  * differs between engines, so raw sums are not hash-stable.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // A1+A3: hash aggregation, the 5 base agg functions (one shuffle,
    // partial+final HashAggregate).
    QueryDef("q1_agg",
      (s, dir) => table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) + lit(1e-6), 2).as("revenue"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(min(col("l_discount")), 6).as("min_disc"),
          round(max(col("l_tax")), 6).as("max_tax"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
             | round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
             | round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue,
             | round(avg(l_extendedprice), 4) AS avg_price,
             | round(min(l_discount), 6) AS min_disc,
             | round(max(l_tax), 6) AS max_tax,
             | count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // P1+P2+P7: conjunctive filter + narrow projection (pushed to the
    // parquet scan: PushedFilters + 3-column ReadSchema).
    QueryDef("q2_filter_project",
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_quantity") > lit(45.0) && col("l_returnflag") === lit("R")
          && col("l_discount") <= lit(0.02))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity > 45.0 AND l_returnflag = 'R' AND l_discount <= 0.02""".stripMargin)),

    // J1/A1: inner equi-join + aggregation (orders x customer); customer is
    // the small build side — Catalyst broadcasts it under AQE.
    QueryDef("q3_join_agg",
      (s, dir) => table(s, dir, "orders")
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")) + lit(1e-6), 2).as("segment_value"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT c_mktsegment, round(sum(o_totalprice) + 1e-6, 2) AS segment_value,
             | count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // Multi-way join across the star schema (lineitem-orders-customer-
    // nation-region), dims broadcast; the TPC-H-style join-reorder case.
    QueryDef("q4_star_join",
      (s, dir) => table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(table(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(table(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) + lit(1e-6), 2).as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT r_name, n_name,
             | round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue,
             | count(*) AS n_items
             |FROM lineitem
             | JOIN orders ON l_orderkey = o_orderkey
             | JOIN customer ON o_custkey = c_custkey
             | JOIN nation ON c_nationkey = n_nationkey
             | JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // A4: conditional (filtered) aggregation — the reference's workhorse
    // (SURVEY.md §2.3 A4): NULL-skipping avg/min/max, zero-filled count/sum.
    QueryDef("q5_conditional_agg",
      (s, dir) => table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", lit(1L)).otherwise(lit(0L))).as("n_finished"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))) + lit(1e-6), 2).as("finished_value"),
          round(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))), 4).as("open_avg"),
          round(max(when(col("o_orderstatus") === "P", col("o_totalprice"))), 2).as("pending_max")),
      Some("""SELECT o_orderpriority,
             | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
             | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) + 1e-6, 2) AS finished_value,
             | round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS open_avg,
             | round(max(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS pending_max
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // P3: ordered CASE WHEN bucketing (the pivot family's window
    // assignment) + multi-key group-by (A2).
    QueryDef("q6_bucket",
      (s, dir) => table(s, dir, "lineitem")
        .withColumn("qty_bucket",
          when(col("l_quantity") <= 10, "small")
            .when(col("l_quantity") <= 25, "medium")
            .when(col("l_quantity") <= 40, "large")
            .otherwise("jumbo"))
        .groupBy(col("qty_bucket"), col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice")) + lit(1e-6), 2).as("bucket_value")),
      Some("""SELECT CASE WHEN l_quantity <= 10 THEN 'small'
             |  WHEN l_quantity <= 25 THEN 'medium'
             |  WHEN l_quantity <= 40 THEN 'large'
             |  ELSE 'jumbo' END AS qty_bucket,
             | l_returnflag, count(*) AS n_rows,
             | round(sum(l_extendedprice) + 1e-6, 2) AS bucket_value
             |FROM lineitem GROUP BY 1, 2""".stripMargin)),

    // A5: pivot with known values (skips the distinct-values scan,
    // SURVEY.md §4) — oracle expressed as conditional aggs with matching
    // column names.
    QueryDef("q7_pivot",
      (s, dir) => table(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot(col("l_returnflag"), Seq("A", "N", "R"))
        .agg(round(sum(col("l_quantity")) + lit(1e-6), 2).as("qty"), count(lit(1)).as("n"))
        // coalesce the counts: a pivot cell with no rows is NULL on the
        // Spark side but 0 from the oracle's count(CASE WHEN ...) — real
        // TPC-H data has empty (linestatus, returnflag) cells.
        .select(col("l_linestatus"), col("A_qty"), coalesce(col("A_n"), lit(0L)).as("A_n"),
          col("N_qty"), coalesce(col("N_n"), lit(0L)).as("N_n"),
          col("R_qty"), coalesce(col("R_n"), lit(0L)).as("R_n")),
      Some("""SELECT l_linestatus,
             | round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) + 1e-6, 2) AS A_qty,
             | count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS A_n,
             | round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) + 1e-6, 2) AS N_qty,
             | count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS N_n,
             | round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) + 1e-6, 2) AS R_qty,
             | count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS R_n
             |FROM lineitem GROUP BY l_linestatus""".stripMargin)),

    // Window functions over a partitioned sort (generic surface beyond the
    // reference, SURVEY.md §2.5): top order per customer by price.
    QueryDef("q8_window",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("top_order"),
            round(col("o_totalprice"), 2).as("top_price"))
      },
      Some("""SELECT o_custkey, o_orderkey AS top_order,
             | round(o_totalprice, 2) AS top_price
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             |   ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders)
             |WHERE rnk = 1""".stripMargin)),

    // Sort + limit (top-k); total order pinned by a unique tiebreaker so
    // the limit is deterministic across engines.
    QueryDef("q9_topk",
      (s, dir) => table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Set operations: customers with orders minus customers with an open
    // order, plus intersect/union legs folded into one result.
    QueryDef("q10_setops",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
        val both = f.intersect(p).withColumn("kind", lit("both"))
        val fOnly = f.except(p).withColumn("kind", lit("f_only"))
        both.union(fOnly).groupBy(col("kind")).agg(count(lit(1)).as("n_cust"))
      },
      Some("""WITH cf AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             | cp AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'),
             | cboth AS (SELECT o_custkey, 'both' AS kind FROM (SELECT * FROM cf INTERSECT SELECT * FROM cp)),
             | conly AS (SELECT o_custkey, 'f_only' AS kind FROM (SELECT * FROM cf EXCEPT SELECT * FROM cp))
             |SELECT kind, count(*) AS n_cust FROM (SELECT * FROM cboth UNION ALL SELECT * FROM conly)
             |GROUP BY kind""".stripMargin)),

    // Left outer join with null handling + distinct.
    QueryDef("q11_left_join",
      (s, dir) => table(s, dir, "customer")
        .join(table(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_big_orders")),
      Some("""SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
             | count(o_orderkey) AS n_big_orders
             |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0)
             | ON c_custkey = o_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // Semi/anti joins (EXISTS / NOT EXISTS).
    QueryDef("q12_semi_anti",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").filter(col("o_orderstatus") === "P")
        val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .withColumn("kind", lit("has_pending"))
        val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .withColumn("kind", lit("no_pending"))
        semi.union(anti).groupBy(col("kind")).agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT kind, count(*) AS n_cust FROM (
             | SELECT 'has_pending' AS kind FROM customer
             |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             | UNION ALL
             | SELECT 'no_pending' AS kind FROM customer
             |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P'))
             |GROUP BY kind""".stripMargin)),

    // P5/P6 + scalar string functions: concat_ws, upper, substring, length.
    QueryDef("q13_strings",
      (s, dir) => table(s, dir, "part")
        .select(col("p_partkey"),
          concat_ws("_", col("p_brand"), col("p_type")).as("brand_type"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).as("name_len")),
      Some("""SELECT p_partkey, concat_ws('_', p_brand, p_type) AS brand_type,
             | upper(substr(p_name, 1, 8)) AS name_prefix,
             | CAST(length(p_name) AS INT) AS name_len
             |FROM part""".stripMargin)),

    // P8: roll-up column arithmetic — greatest/least/sum-of-columns (the
    // pivot family's bucket combine step as a standalone surface).
    QueryDef("q14_rollup_arith",
      (s, dir) => table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")) + lit(1e-6), 2).as("q"),
          round(min(col("l_extendedprice")), 2).as("pmin"),
          round(max(col("l_extendedprice")), 2).as("pmax"))
        .select(col("l_orderkey"),
          round(col("q") + col("pmin") + col("pmax"), 2).as("combined"),
          round(greatest(col("q"), col("pmin"), col("pmax")), 2).as("g"),
          round(least(col("q"), col("pmin"), col("pmax")), 2).as("l")),
      Some("""SELECT l_orderkey, round(q + pmin + pmax, 2) AS combined,
             | round(greatest(q, pmin, pmax), 2) AS g,
             | round(least(q, pmin, pmax), 2) AS l
             |FROM (SELECT l_orderkey, round(sum(l_quantity) + 1e-6, 2) AS q,
             |   round(min(l_extendedprice), 2) AS pmin,
             |   round(max(l_extendedprice), 2) AS pmax
             |  FROM lineitem GROUP BY l_orderkey)""".stripMargin)),

    // Event-time tumbling-window aggregation over the events table — the
    // batch shape of the Structured Streaming pipeline (graft.streaming).
    QueryDef("q15_event_windows",
      (s, dir) => table(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")) + lit(1e-6), 2).as("total_value")),
      Some("""SELECT date_trunc('day', ts) AS day, event_type,
             | count(*) AS n_events, round(sum(value) + 1e-6, 2) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // JSON extraction from the events props column (get_json_object).
    QueryDef("q16_json",
      (s, dir) => table(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy(col("k_val")).agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k_val, count(*) AS n
             |FROM events GROUP BY 1""".stripMargin)),

    // Grouping sets surface (rollup) — A8 "available built-in".
    QueryDef("q17_rollup",
      (s, dir) => table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")) + lit(1e-6), 2).as("qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             | round(sum(l_quantity) + 1e-6, 2) AS qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // J2: full-outer stitch of two aggregates on a shared key with
    // asymmetric coverage — the reference's two-family stitch join
    // (reference impl/duckdb_pivot.py:105-110).
    QueryDef("q18_full_outer",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val a = o.filter(col("o_orderstatus") === "P")
          .groupBy(col("o_custkey").as("ck_a"))
          .agg(count(lit(1)).as("n_pending"))
        val b = o.filter(col("o_totalprice") > 300000.0)
          .groupBy(col("o_custkey").as("ck_b"))
          .agg(count(lit(1)).as("n_big"))
        a.join(b, col("ck_a") === col("ck_b"), "full_outer")
          .select(coalesce(col("ck_a"), col("ck_b")).as("custkey"),
            col("n_pending"), col("n_big"))
      },
      Some("""SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey, n_pending, n_big
             |FROM (SELECT o_custkey, count(*) AS n_pending FROM orders
             |      WHERE o_orderstatus = 'P' GROUP BY o_custkey) a
             |FULL JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
             |      WHERE o_totalprice > 300000.0 GROUP BY o_custkey) b
             | ON a.o_custkey = b.o_custkey""".stripMargin)),

    // SQL frontend surface: the same engine over spark.sql(...) — views
    // registered, ANSI SQL in, Catalyst plans out.
    QueryDef("q20_sql",
      (s, dir) => {
        table(s, dir, "orders").createOrReplaceTempView("orders_v")
        table(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""SELECT c_mktsegment, o_orderstatus,
                |  count(*) AS n, round(sum(o_totalprice) + 1e-6, 2) AS total
                |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
                |WHERE o_totalprice > 100000.0
                |GROUP BY c_mktsegment, o_orderstatus""".stripMargin)
      },
      Some("""SELECT c_mktsegment, o_orderstatus,
             | count(*) AS n, round(sum(o_totalprice) + 1e-6, 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_totalprice > 100000.0
             |GROUP BY c_mktsegment, o_orderstatus""".stripMargin)),

    // Skew-proof salted aggregation (graft.operators.SkewJoin): exact
    // same answer as a plain group-by, hot keys spread across tasks.
    QueryDef("q21_salted_agg",
      (s, dir) => graft.operators.SkewJoin
        .saltedCountSum(table(s, dir, "lineitem"), "l_returnflag", "l_quantity", 8)
        .select(col("l_returnflag"), col("n_rows"),
          round(col("sum_value") + lit(1e-6), 2).as("sum_value")),
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             | round(sum(l_quantity) + 1e-6, 2) AS sum_value
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Salted JOIN (SkewJoin.saltedJoin, the q21 companion): the skewed
    // left side is salted, the replicable right side exploded
    // `salts`× — a known-in-advance hot key spreads over 8 tasks
    // instead of one straggler. Salt values only ROUTE rows, so the
    // result is exactly the plain join the oracle runs.
    QueryDef("q29_salted_join",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
        val ord = table(s, dir, "orders")
          .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
        graft.operators.SkewJoin.saltedJoin(li, ord, "okey", 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")) + lit(1e-6), 2).as("revenue"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_items,
             | round(sum(l_extendedprice) + 1e-6, 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus""".stripMargin)),

    // As-of (point-in-time) join — graft.operators.AsOfJoin's union +
    // carry-forward formulation, checked against DuckDB's NATIVE
    // ASOF LEFT JOIN: for each error event, the latest click at or
    // before it by the same user.
    QueryDef("q22_asof",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        graft.operators.AsOfJoin
          .backward(errors, clicks, "user_id", "ts",
            Seq("click_id", "click_value"), suffix = "")
          .select(col("event_id"), col("user_id"),
            col("click_id"), round(col("click_value"), 4).as("click_value"))
      },
      Some("""WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
             | c AS (SELECT * FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id, c.event_id AS click_id,
             | round(c.value, 4) AS click_value
             |FROM e ASOF LEFT JOIN c
             | ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin)),

    // Analytic window family beyond rank: lag/lead (order deltas per
    // customer), ntile spend-quartile, running cumulative sum — each a
    // single window pass over the same partitioned sort.
    QueryDef("q28_analytics",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("run_total",
            sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("prev_price"), 2).as("prev_price"),
            round(col("next_price"), 2).as("next_price"),
            col("quartile"),
            round(col("run_total") + lit(1e-6), 2).as("run_total"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             | round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
             | CAST(ntile(4) OVER w AS INT) AS quartile,
             | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |   ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 0.000001, 2) AS run_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // Forward ASOF: for each error event, the NEXT click at or after it
    // by the same user (time-negated backward machinery; DuckDB oracle
    // flips the inequality).
    QueryDef("q27_asof_forward",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        graft.operators.AsOfJoin
          .forward(errors, clicks, "user_id", "ts",
            Seq("click_id", "click_value"), suffix = "")
          .select(col("event_id"), col("user_id"),
            col("click_id"), round(col("click_value"), 4).as("click_value"))
      },
      Some("""WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
             | c AS (SELECT * FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id, c.event_id AS click_id,
             | round(c.value, 4) AS click_value
             |FROM e ASOF LEFT JOIN c
             | ON e.user_id = c.user_id AND e.ts <= c.ts""".stripMargin)),

    // Range (interval) join: equi key + time-band condition — clicks in
    // the hour before each error. Catalyst plans the equi part as the
    // join key (shuffle by user) and the band as a join-side filter, so
    // it scales with per-key density, not |left| x |right|. Both engines
    // compare at microsecond precision (ns truncated identically).
    QueryDef("q23_range_join",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        errors.join(clicks,
            col("user_id") === col("c_user") &&
              col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
              col("c_ts") < col("ts"), "left")
          .groupBy(col("event_id"), col("user_id"))
          .agg(count(col("c_ts")).as("clicks_before"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |   FROM events WHERE event_type = 'error'),
             | c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
             |   FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id, count(c.ts) AS clicks_before
             |FROM e LEFT JOIN c ON e.user_id = c.user_id
             | AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts < e.ts
             |GROUP BY e.event_id, e.user_id""".stripMargin)),

    // Session windows (30-min inactivity gap) — Spark's session_window;
    // the oracle reproduces the same sessionization as gaps-and-islands
    // SQL (new session when the gap is >= 30 min).
    QueryDef("q24_session",
      (s, dir) => table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")) + lit(1e-6), 2).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("session_value")),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
             |   FROM events),
             | x AS (SELECT user_id, ts, value,
             |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
             |   THEN 1 ELSE 0 END AS new_s FROM e),
             | y AS (SELECT user_id, ts, value,
             |   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM x)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
             | round(sum(value) + 1e-6, 2) AS session_value
             |FROM y GROUP BY user_id, sid""".stripMargin)),

    // Exact percentiles (sort-based aggregate; both engines interpolate
    // linearly on the sorted values) + approx_percentile contrast is
    // deliberately absent from the oracle (sketches don't hash-match).
    QueryDef("q25_percentiles",
      (s, dir) => table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)") + lit(1e-6), 4).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)") + lit(1e-6), 4).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.99)") + lit(1e-6), 4).as("p99_price")),
      Some("""SELECT l_returnflag,
             | round(quantile_cont(l_quantity, 0.5) + 0.000001, 4) AS p50_qty,
             | round(quantile_cont(l_quantity, 0.9) + 0.000001, 4) AS p90_qty,
             | round(quantile_cont(l_extendedprice, 0.99) + 0.000001, 4) AS p99_price
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Approximate aggregation (HLL++ distinct sketch + quantile sketch)
    // as a BOUNDS-CHECK gate: sketch estimates are engine-specific, so
    // the raw estimates can't hash-match a DuckDB oracle — instead the
    // engine emits, per group, the EXACT statistic plus a boolean
    // "within ε of the sketch estimate" flag, and the oracle emits the
    // exact statistic plus literal TRUE. A sketch straying outside its
    // published error envelope flips a flag and fails the hash compare.
    // ε = 5% ≈ 2.5σ of the requested HLL rsd (2%); approx_percentile at
    // accuracy 1000 has rank error ≤ n/1000, far inside 5% of p50 on
    // this data. Both sketches are deterministic for fixed input, so the
    // gate is stable, and it stays a real guard: swap the sketch for a
    // broken one and the flags flip. Exact twins remain q11/q25.
    QueryDef("q26_approx",
      (s, dir) => {
        // distinct-agg and percentile aggregations run as SEPARATE
        // frames joined on the 3-row group key: countDistinct plans an
        // Expand (one row copy per distinct grouping), and feeding that
        // doubled stream through percentile's per-group object buffers
        // demotes the whole aggregate to a spilling sort-agg (measured
        // 418 s vs <1 s at sf0.1). Split, each aggregation keeps its
        // natural physical form (partial-agg'd Expand / ObjectHashAgg)
        // over a pruned 2-column scan, and the join is a broadcast of
        // 3 rows.
        val li = table(s, dir, "lineitem")
        val d = li.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("exact_orders"),
            approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("__hll"))
        val p = li.groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_extendedprice, 0.5)").as("__p50"),
            expr("element_at(approx_percentile(l_extendedprice, array(0.5, 0.99), 1000), 1)")
              .as("__ap50"))
        d.join(broadcast(p), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_orders"),
            (abs(col("__hll") - col("exact_orders")) <=
              col("exact_orders") * lit(0.05)).as("hll_within_eps"),
            (abs(col("__ap50") - col("__p50")) <=
              abs(col("__p50")) * lit(0.05)).as("pctl_within_eps"))
      },
      Some("""SELECT l_returnflag,
             | count(DISTINCT l_orderkey) AS exact_orders,
             | TRUE AS hll_within_eps, TRUE AS pctl_within_eps
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // A8 completion: cube over two dimensions with grouping_id
    // disambiguating the NULL group labels.
    QueryDef("q19_cube",
      (s, dir) => table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum(col("l_quantity")) + lit(1e-6), 2).as("qty")),
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             | count(*) AS n, round(sum(l_quantity) + 1e-6, 2) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin))
  )
}
