package graft.features

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A7 — the grouped-UDF escape hatch: ship each key's rows to one task and
  * compute the whole feature row imperatively, like the reference's
  * `groupBy(customer_id).applyInPandas(...)` / `applyInArrow(...)`
  * (reference impl/pyspark-pandas-udf.py:64-81,
  * impl/pyspark4-polars-udf.py:80-107) — except the closure stays in the
  * JVM (`KeyValueGroupedDataset.mapGroups`), so there is no Arrow/IPC hop
  * to a worker process, the reference strategy's dominant cost.
  *
  * Physical plan: Scan -> Exchange(key) -> Sort(key) -> MapGroups. All of a
  * key's rows land on one task, so — unlike the agg strategies — hot keys
  * are NOT skew-immune (SURVEY.md 2.7.6). This is deliberately the
  * *escape hatch* for per-group logic Catalyst can't express, not the
  * default: CaseWhenStrategy / PivotRollupStrategy are the production
  * paths. Semantics match them exactly (same null/zero rules).
  */
object MapGroupsStrategy extends FeatureStrategy {

  def apply(df: DataFrame, spec: FeatureSpec): DataFrame = {
    val spark = df.sparkSession
    val maxWin = spec.windows.max
    val windows = spec.windows.toArray
    val nWin = windows.length

    // Narrow projection: key, value (double), time (long), then each
    // family's columns — column pruning reaches the scan exactly like the
    // declarative strategies.
    val famColNames: Array[Array[String]] = spec.groupings.map(_.cols.toArray).toArray
    val dataCols = famColNames.flatten.distinct
    val colPos: Map[String, Int] = dataCols.zipWithIndex.map { case (c, i) => (c, i + 3) }.toMap
    val famPos: Array[Array[Int]] = famColNames.map(_.map(colPos))
    val tupleIdx: Array[Map[List[String], Int]] = spec.groupings.map { fam =>
      fam.valueTuples.zipWithIndex.map { case (t, i) => (t.toList, i) }.toMap
    }.toArray
    val nTuples: Array[Int] = spec.groupings.map(_.valueTuples.length).toArray

    val keyField = df.schema(spec.keyCol)
    val outSchema = StructType(
      keyField +: spec.features.map { f =>
        StructField(f.name,
          if (f.agg == AggKind.Count) LongType else DoubleType, nullable = true)
      })

    // Feature -> (family, tuple index, highest bucket included, agg).
    val featPlan: Array[(Int, Int, Int, AggKind)] = spec.features.map { f =>
      (f.familyIdx, tupleIdx(f.familyIdx)(f.tuple.toList),
        windows.indexOf(f.window), f.agg)
    }.toArray

    val narrowed = df
      .filter(col(spec.timeCol) <= lit(maxWin))
      .select((Seq(col(spec.keyCol), col(spec.valueCol).cast(DoubleType),
        col(spec.timeCol).cast(LongType)) ++ dataCols.map(col)): _*)

    val nFam = famPos.length
    val grouped = narrowed.groupByKey(row => String.valueOf(row.get(0)))(Encoders.STRING)
    val result = grouped.mapGroups { (_, rows) =>
      // Accumulators per (family, tuple, smallest-enclosing-window bucket):
      // row count, non-null count, sum, min, max.
      val cnt = Array.ofDim[Long](nFam, nTuples.max, nWin)
      val nnz = Array.ofDim[Long](nFam, nTuples.max, nWin)
      val sum = Array.ofDim[Double](nFam, nTuples.max, nWin)
      val mn = Array.fill(nFam, nTuples.max, nWin)(Double.NaN)
      val mx = Array.fill(nFam, nTuples.max, nWin)(Double.NaN)
      var key: Any = null
      while (rows.hasNext) {
        val row = rows.next()
        if (key == null) key = row.get(0)
        val t = row.getLong(2)
        var b = 0
        while (b < nWin && windows(b) < t) b += 1
        if (b < nWin) {
          var fi = 0
          while (fi < nFam) {
            val tuple = famPos(fi).map { p =>
              val v = row.get(p); if (v == null) null else v.toString
            }.toList
            tupleIdx(fi).get(tuple) match {
              case Some(ti) =>
                cnt(fi)(ti)(b) += 1L
                if (!row.isNullAt(1)) {
                  val v = row.getDouble(1)
                  nnz(fi)(ti)(b) += 1L
                  sum(fi)(ti)(b) += v
                  if (mn(fi)(ti)(b).isNaN || v < mn(fi)(ti)(b)) mn(fi)(ti)(b) = v
                  if (mx(fi)(ti)(b).isNaN || v > mx(fi)(ti)(b)) mx(fi)(ti)(b) = v
                }
              case None => ()
            }
            fi += 1
          }
        }
      }
      // Roll buckets up into cumulative windows; same algebra as
      // PivotRollupStrategy (exact avg = sum/nnz).
      val out = new Array[Any](1 + featPlan.length)
      out(0) = key
      var i = 0
      while (i < featPlan.length) {
        val (fi, ti, bMax, agg) = featPlan(i)
        var c = 0L; var z = 0L; var s = 0.0
        var lo = Double.NaN; var hi = Double.NaN
        var b = 0
        while (b <= bMax) {
          c += cnt(fi)(ti)(b); z += nnz(fi)(ti)(b); s += sum(fi)(ti)(b)
          val bmn = mn(fi)(ti)(b); val bmx = mx(fi)(ti)(b)
          if (!bmn.isNaN && (lo.isNaN || bmn < lo)) lo = bmn
          if (!bmx.isNaN && (hi.isNaN || bmx > hi)) hi = bmx
          b += 1
        }
        out(i + 1) = agg match {
          case AggKind.Count => c
          case AggKind.Sum   => s
          case AggKind.Avg   => if (z > 0) s / z else null
          case AggKind.Min   => if (lo.isNaN) null else lo
          case AggKind.Max   => if (hi.isNaN) null else hi
        }
        i += 1
      }
      Row.fromSeq(out.toIndexedSeq)
    }(Encoders.row(outSchema))
    result.toDF()
  }
}
