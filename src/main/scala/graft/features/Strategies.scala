package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a [[FeatureSpec]] into a Spark plan. Four interchangeable
  * strategies (same output schema and values — pinned by
  * StrategyEquivalenceSpec; this file holds the two declarative ones,
  * [[MapGroupsStrategy]] and [[AggregatorStrategy]] the imperative two):
  *
  *   - [[CaseWhenStrategy]]: one `groupBy(key).agg(N conditional aggs)` —
  *     spec-exact, a single shuffle, heavy codegen
  *     (reference impl/pyspark-case-when.py:102-130).
  *   - [[PivotRollupStrategy]]: bucket rows into their smallest enclosing
  *     window, pivot on (family-tuple, bucket) with known values, then roll
  *     buckets up into cumulative windows with plain column arithmetic
  *     (reference impl/pyspark-pivot.py:49-143). Unlike the reference, avg
  *     is rolled up exactly as sum/count (fixes SURVEY.md 2.7.2), and both
  *     grouping families are computed in ONE scan/shuffle by exploding each
  *     row into its per-family pivot keys (the reference scans the input
  *     twice and joins, impl/pyspark-pivot.py:185-189).
  *
  * Both produce `keyCol` + one column per [[Feature]] in canonical order.
  */
trait FeatureStrategy {
  def apply(df: DataFrame, spec: FeatureSpec): DataFrame
}

/** Single-pass conditional aggregation: `agg_k(CASE WHEN cond THEN x END)`
  * for every (tuple, window, agg) combo, all inside one `agg()` call so
  * Catalyst plans Scan -> partial HashAggregate -> Exchange(key) -> final
  * HashAggregate: exactly one shuffle of pre-aggregated state regardless of
  * input size — the skew-immune, 100TB-safe shape.
  */
object CaseWhenStrategy extends FeatureStrategy {

  def apply(df: DataFrame, spec: FeatureSpec): DataFrame = {
    val exprs = spec.features.map { f =>
      val fam = spec.groupings(f.familyIdx)
      val cond = fam.cols.zip(f.tuple).foldLeft(col(spec.timeCol) <= lit(f.window)) {
        case (acc, (c, v)) => acc && col(c) === lit(v)
      }
      val v = col(spec.valueCol)
      val e = f.agg match {
        // count -> 0 and sum -> 0.0 when no matching non-NULL values;
        // avg/min/max -> NULL (spec-canonical semantics, SURVEY.md 2.7.3).
        // coalesce instead of the reference's `.otherwise(0)` so the result
        // is total even when EVERY group row matches with a NULL value —
        // the one case where the reference's form leaks a NULL.
        case AggKind.Count => sum(when(cond, lit(1L)).otherwise(lit(0L)))
        case AggKind.Sum   => coalesce(sum(when(cond, v)), lit(0.0d))
        case AggKind.Avg   => avg(when(cond, v))
        case AggKind.Min   => min(when(cond, v))
        case AggKind.Max   => max(when(cond, v))
      }
      e.as(f.name)
    }
    df.groupBy(col(spec.keyCol)).agg(exprs.head, exprs.tail: _*)
  }
}

/** Bucket -> pivot(known values) -> exact algebraic roll-up, in one scan.
  *
  * Each row is aggregated once (into its smallest enclosing window bucket)
  * instead of once per enclosing window, so partial-aggregate state per key
  * is `tuples x windows x 4` cells instead of evaluating `features` CASE
  * predicates per row — the reason this family wins at scale
  * (BASELINE.md: 455s vs 17,653s at medium).
  *
  * Both grouping families ride one shuffle: each input row explodes into
  * one pivot key per family (`f{i}_{v1}_{v2}_{bucket}`), and partial
  * aggregation collapses the 2x row inflation to fixed-size state before
  * the exchange. Rows outside every window (t_minus > max) get a NULL
  * bucket, are dropped by the known-values pivot, and are filtered before
  * the shuffle anyway.
  */
object PivotRollupStrategy extends FeatureStrategy {

  private val winCol = "__graft_win"
  private val pivotCol = "__graft_pivot"

  def apply(df: DataFrame, spec: FeatureSpec): DataFrame = {
    val maxWin = spec.windows.max

    // Smallest enclosing window bucket for each row: ascending CASE WHEN
    // chain <=7 -> "7", <=14 -> "14", ... else NULL.
    val winExpr = spec.windows.tail.foldLeft(
      when(col(spec.timeCol) <= lit(spec.windows.head), lit(spec.windows.head.toString))
    ) { (acc, w) => acc.when(col(spec.timeCol) <= lit(w), lit(w.toString)) }

    // One pivot key per grouping family, exploded so a single group-by
    // covers every family without a second scan or a stitch join. Plain
    // `concat` (not concat_ws): a NULL grouping value or NULL bucket makes
    // the whole key NULL, which the known-values pivot drops — identical to
    // the case-when path where `col === lit(v)` is never true on NULL.
    val famKeys = spec.groupings.zipWithIndex.map { case (fam, fi) =>
      val parts = (lit(s"f$fi") +: fam.cols.map(col)) :+ col(winCol)
      concat(parts.flatMap(p => Seq(lit("_"), p)).tail: _*)
    }

    val exploded = df
      .filter(col(spec.timeCol) <= lit(maxWin)) // partition/row pruning at the scan
      .withColumn(winCol, winExpr)
      .select(col(spec.keyCol), col(spec.valueCol),
        explode(array(famKeys: _*)).as(pivotCol))

    val pivotValues: Seq[String] =
      for {
        (fam, fi) <- spec.groupings.zipWithIndex
        tuple <- fam.valueTuples
        w <- spec.windows
      } yield (s"f$fi" +: tuple :+ w.toString).mkString("_")

    // Five cells per bucket: `rows` counts matching ROWS (what the Count
    // feature means — NULL values included, same as the case-when path's
    // sum(when(cond,1).otherwise(0))), `nnz` counts non-NULL values (the
    // exact-avg denominator and the sum NULL-semantics guard).
    val v = col(spec.valueCol)
    val wide = exploded
      .groupBy(col(spec.keyCol))
      .pivot(pivotCol, pivotValues)
      .agg(count(lit(1L)).as("rows"), count(v).as("nnz"),
        sum(v).as("sum"), min(v).as("min"), max(v).as("max"))

    // Roll disjoint buckets up into cumulative windows. Exact for every
    // agg: counts/sums add (NULL cells = empty bucket = 0), min/max via
    // least/greatest (NULL-skipping), avg derived as sum/nnz — unlike
    // reference impl/pyspark-pivot.py:98's unweighted mean-of-means.
    def bucketCol(f: Feature, w: Int, agg: String): Column =
      col(s"`${(s"f${f.familyIdx}" +: f.tuple :+ w.toString).mkString("_")}_$agg`")

    val outCols = spec.features.map { f =>
      val bucketsUpTo = spec.windows.filter(_ <= f.window)
      def sumOf(agg: String, zero: Column): Column =
        bucketsUpTo.map(w => coalesce(bucketCol(f, w, agg), zero)).reduce(_ + _)
      lazy val nnz = sumOf("nnz", lit(0L))
      val e = f.agg match {
        case AggKind.Count => sumOf("rows", lit(0L))
        case AggKind.Sum   => sumOf("sum", lit(0.0d))
        case AggKind.Avg   => when(nnz > 0, sumOf("sum", lit(0.0d)) / nnz)
        case AggKind.Min =>
          val cs = bucketsUpTo.map(w => bucketCol(f, w, "min"))
          if (cs.length == 1) cs.head else least(cs: _*)
        case AggKind.Max =>
          val cs = bucketsUpTo.map(w => bucketCol(f, w, "max"))
          if (cs.length == 1) cs.head else greatest(cs: _*)
      }
      e.as(f.name)
    }
    wide.select(col(spec.keyCol) +: outCols: _*)
  }
}
