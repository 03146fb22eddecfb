package graft.features

/** The five aggregate kinds of the reference spec
  * (reference docs/index.md:124-132).
  */
sealed trait AggKind { def name: String }
object AggKind {
  case object Count extends AggKind { val name = "count" }
  case object Avg extends AggKind { val name = "avg" }
  case object Sum extends AggKind { val name = "sum" }
  case object Min extends AggKind { val name = "min" }
  case object Max extends AggKind { val name = "max" }
  val All: Seq[AggKind] = Seq(Count, Avg, Sum, Min, Max)
}

/** One grouping family: category columns crossed over their known values.
  * The reference has two: (card_type x trx_type) and (channel x trx_type)
  * (reference docs/index.md:136-140).
  */
final case class GroupingFamily(cols: Seq[String], valueTuples: Seq[Seq[String]]) {
  require(valueTuples.forall(_.length == cols.length),
    "every value tuple must match the grouping column arity")
}

object GroupingFamily {
  /** Cartesian product of per-column known values. */
  def cross(colValues: (String, Seq[String])*): GroupingFamily = {
    val cols = colValues.map(_._1)
    val tuples = colValues.map(_._2).foldLeft(Seq(Seq.empty[String])) {
      (acc, vs) => for (t <- acc; v <- vs) yield t :+ v
    }
    GroupingFamily(cols, tuples)
  }
}

/** One output feature column: aggregate `agg` of `valueCol` over rows where
  * the family columns equal `tuple` and `timeCol <= window`.
  * Canonical name: `{v1}_{v2}_{W}d_{agg}` (SURVEY.md 2.7.5).
  */
final case class Feature(familyIdx: Int, tuple: Seq[String], window: Int, agg: AggKind) {
  def name: String = s"${tuple.mkString("_")}_${window}d_${agg.name}"
}

/** Declarative description of a feature-store partition build: for each
  * grouping-family value tuple, each cumulative time window and each agg,
  * compute agg(valueCol) over the matching rows, grouped by keyCol.
  *
  * Null/zero semantics follow the spec-canonical case-when family
  * (SURVEY.md 2.7.3): count -> 0 and sum -> 0.0 when no rows match;
  * avg/min/max -> NULL.
  */
final case class FeatureSpec(
    keyCol: String,
    valueCol: String,
    timeCol: String,
    windows: Seq[Int],
    groupings: Seq[GroupingFamily],
    aggs: Seq[AggKind] = AggKind.All
) {
  require(windows == windows.sorted, "windows must be ascending")

  /** All output features in canonical column order. */
  lazy val features: Seq[Feature] =
    for {
      (fam, fi) <- groupings.zipWithIndex
      tuple <- fam.valueTuples
      w <- windows
      agg <- aggs
    } yield Feature(fi, tuple, w, agg)

  /** Output column names: key followed by the feature columns. */
  def outputColumns: Seq[String] = keyCol +: features.map(_.name)

  /** ANSI SQL equivalent (conditional-aggregation form) runnable by DuckDB
    * on a relation providing keyCol, valueCol, timeCol and the grouping
    * columns. `from` is a table name or parenthesized subquery.
    */
  def toOracleSql(from: String, round: Int = 4): String = {
    def cond(f: Feature): String = {
      val fam = groupings(f.familyIdx)
      val eqs = fam.cols.zip(f.tuple).map { case (c, v) => s"$c = '$v'" }
      (s"$timeCol <= ${f.window}" +: eqs).mkString(" AND ")
    }
    // The + 1e-6 epsilon matches FeatureStrategy.roundFeatures: it shifts
    // decimal-exact rounding ties (e.g. an avg of 2-decimal values landing
    // on .xxxx5) off the boundary, where Spark's string-based Round and
    // DuckDB's multiply-based round would otherwise disagree.
    def r(e: String): String = s"round($e + 0.000001, $round)"
    val exprs = features.map { f =>
      val c = cond(f)
      val e = f.agg match {
        case AggKind.Count => s"CAST(sum(CASE WHEN $c THEN 1 ELSE 0 END) AS BIGINT)"
        case AggKind.Sum   => r(s"coalesce(sum(CASE WHEN $c THEN $valueCol END), 0)")
        case AggKind.Avg   => r(s"avg(CASE WHEN $c THEN $valueCol END)")
        case AggKind.Min   => r(s"min(CASE WHEN $c THEN $valueCol END)")
        case AggKind.Max   => r(s"max(CASE WHEN $c THEN $valueCol END)")
      }
      s"""$e AS "${f.name}""""
    }
    s"SELECT $keyCol, ${exprs.mkString(", ")} FROM $from GROUP BY $keyCol"
  }
}

object FeatureSpec {
  import graft.model.Model

  /** The reference benchmark's exact spec: 5 aggs x 8 windows x
    * (2x13 + 2x13) group combos = 2,080 features keyed by customer_id
    * (reference docs/index.md:120-151).
    */
  val reference: FeatureSpec = FeatureSpec(
    keyCol = "customer_id",
    valueCol = "trx_amnt",
    timeCol = "t_minus",
    windows = Model.Windows,
    groupings = Seq(
      GroupingFamily.cross("card_type" -> Model.CardTypes, "trx_type" -> Model.TrxTypes),
      GroupingFamily.cross("channel" -> Model.Channels, "trx_type" -> Model.TrxTypes)
    )
  )
}
