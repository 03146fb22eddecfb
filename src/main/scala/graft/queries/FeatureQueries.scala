package graft.queries

import graft.features._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship feature-generation query (reference docs/index.md:120-151),
  * instantiated on the driver's `events` table so the DuckDB oracle can
  * check it end-to-end: key = user_id, value = value, grouping family =
  * event_type, time = days before 2024-01-31 derived from `ts`.
  *
  * Both strategies are registered against the SAME oracle SQL — the
  * conditional-aggregation form — which simultaneously pins the case-when
  * compiler, the pivot+rollup compiler, and their mutual equivalence.
  */
object FeatureQueries {

  private val RefDate = "2024-01-31"
  private val Round = 4

  val eventsSpec: FeatureSpec = FeatureSpec(
    keyCol = "user_id",
    valueCol = "value",
    timeCol = "t_minus",
    windows = Seq(7, 14, 30),
    groupings = Seq(GroupingFamily(
      Seq("event_type"),
      Seq("click", "error", "purchase", "signup", "view").map(Seq(_))
    ))
  )

  /** events + derived integer day-offset column (the reference models time
    * as `t_minus`, SURVEY.md §1.1 — here derived from a real timestamp).
    */
  private def prepared(df: DataFrame): DataFrame =
    df.withColumn("t_minus",
      datediff(to_date(lit(RefDate)), to_date(col("ts"))).cast("long"))

  private val oracleFrom =
    s"""(SELECT user_id, value, event_type,
       | datediff('day', CAST(ts AS DATE), DATE '$RefDate') AS t_minus
       | FROM events)""".stripMargin.replace("\n", "")

  private val oracle = eventsSpec.toOracleSql(oracleFrom, Round)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("feature_events_casewhen",
      (s, dir) => QueryDef.roundForOracle(
        CaseWhenStrategy(prepared(QueryDef.table(s, dir, "events")), eventsSpec),
        eventsSpec, Round),
      Some(oracle)),
    QueryDef("feature_events_pivot",
      (s, dir) => QueryDef.roundForOracle(
        PivotRollupStrategy(prepared(QueryDef.table(s, dir, "events")), eventsSpec),
        eventsSpec, Round),
      Some(oracle)),
    QueryDef("feature_events_mapgroups",
      (s, dir) => QueryDef.roundForOracle(
        MapGroupsStrategy(prepared(QueryDef.table(s, dir, "events")), eventsSpec),
        eventsSpec, Round),
      Some(oracle)),
    QueryDef("feature_events_aggregator",
      (s, dir) => QueryDef.roundForOracle(
        AggregatorStrategy(prepared(QueryDef.table(s, dir, "events")), eventsSpec),
        eventsSpec, Round),
      Some(oracle))
  )
}
