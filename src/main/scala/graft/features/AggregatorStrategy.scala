package graft.features

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine-native strategy: a typed [[Aggregator]] (SURVEY.md §2's
  * "custom TypedColumn/Aggregator" extension point) that keeps ONE flat
  * cell array per key — (family-tuple x smallest-enclosing-window bucket)
  * x (rows, nnz, sum, min, max) — updated imperatively per row.
  *
  * Why it beats both declarative strategies at scale:
  *
  *   - per-row work is two hash lookups + one bucket scan, not 2,080 CASE
  *     predicates (case-when) and not a row explode + 416-value pivot;
  *   - it is ONE shuffle of compact partial state (Spark's multi-agg pivot
  *     needs two exchanges; mapGroups shuffles raw rows and concentrates
  *     hot keys on single tasks);
  *   - partial merge is an array add, so it stays skew-immune.
  *
  * Runs as ObjectHashAggregate: the cell array lives as a JVM object in
  * the agg hash map and is Kryo-serialized only at the shuffle boundary.
  * GraftSession raises the sort-based fallback threshold (default 128
  * distinct keys) so the hash path is actually used; beyond it Spark
  * falls back to sort-based aggregation gracefully. The buffer is
  * ~40 bytes x cells (16.6 KB for the reference's 416-cell spec), so
  * ~100k in-flight keys per task ≈ 1.7 GB — size executor memory or the
  * fallback threshold accordingly.
  */
object AggregatorStrategy extends FeatureStrategy {

  /** Flat per-key accumulator. */
  final case class Cells(
      cnt: Array[Long], nnz: Array[Long],
      sum: Array[Double], mn: Array[Double], mx: Array[Double])

  private final class FeatureAgg(
      windows: Array[Int],
      famTupleIdx: Array[java.util.HashMap[String, Integer]],
      famCellOffset: Array[Int],
      famColPos: Array[Array[Int]],
      nCells: Int,
      featPlan: Array[(Int, Int, Int, Int)], // cellBase, bucketMax, aggKindOrd, _
      outSchema: StructType
  ) extends Aggregator[Row, Cells, Row] {

    private val nWin = windows.length

    override def zero: Cells = {
      val mn = Array.fill(nCells)(Double.NaN)
      val mx = Array.fill(nCells)(Double.NaN)
      Cells(new Array[Long](nCells), new Array[Long](nCells),
        new Array[Double](nCells), mn, mx)
    }

    override def reduce(b: Cells, row: Row): Cells = {
      // row: (value: Double?, time: Long, famCols: String...)
      val t = row.getLong(1)
      var bkt = 0
      while (bkt < nWin && windows(bkt) < t) bkt += 1
      if (bkt < nWin) {
        var fi = 0
        while (fi < famColPos.length) {
          // single '\u0000'-joined key: one allocation, one hash lookup
          // per (row, family); a NULL grouping value matches no tuple.
          val pos = famColPos(fi)
          var key: String = null
          if (pos.length == 1) {
            val v = row.get(pos(0))
            if (v != null) key = v.toString
          } else {
            val sb = new java.lang.StringBuilder(32)
            var ok = true
            var i = 0
            while (ok && i < pos.length) {
              val v = row.get(pos(i))
              if (v == null) ok = false
              else {
                if (i > 0) sb.append('\u0000')
                sb.append(v)
              }
              i += 1
            }
            if (ok) key = sb.toString
          }
          val ti = if (key == null) null else famTupleIdx(fi).get(key)
          if (ti != null) {
            val c = famCellOffset(fi) + ti.intValue() * nWin + bkt
            b.cnt(c) += 1L
            if (!row.isNullAt(0)) {
              val v = row.getDouble(0)
              b.nnz(c) += 1L
              b.sum(c) += v
              if (b.mn(c).isNaN || v < b.mn(c)) b.mn(c) = v
              if (b.mx(c).isNaN || v > b.mx(c)) b.mx(c) = v
            }
          }
          fi += 1
        }
      }
      b
    }

    override def merge(a: Cells, b: Cells): Cells = {
      var i = 0
      while (i < nCells) {
        a.cnt(i) += b.cnt(i); a.nnz(i) += b.nnz(i); a.sum(i) += b.sum(i)
        if (!b.mn(i).isNaN && (a.mn(i).isNaN || b.mn(i) < a.mn(i))) a.mn(i) = b.mn(i)
        if (!b.mx(i).isNaN && (a.mx(i).isNaN || b.mx(i) > a.mx(i))) a.mx(i) = b.mx(i)
        i += 1
      }
      a
    }

    override def finish(b: Cells): Row = {
      val out = new Array[Any](featPlan.length)
      var i = 0
      while (i < featPlan.length) {
        val (base, bMax, aggOrd, _) = featPlan(i)
        var c = 0L; var z = 0L; var s = 0.0
        var lo = Double.NaN; var hi = Double.NaN
        var bkt = 0
        while (bkt <= bMax) {
          val cell = base + bkt
          c += b.cnt(cell); z += b.nnz(cell); s += b.sum(cell)
          if (!b.mn(cell).isNaN && (lo.isNaN || b.mn(cell) < lo)) lo = b.mn(cell)
          if (!b.mx(cell).isNaN && (hi.isNaN || b.mx(cell) > hi)) hi = b.mx(cell)
          bkt += 1
        }
        out(i) = aggOrd match {
          case 0 => c                              // count
          case 1 => if (z > 0) s / z else null     // avg
          case 2 => s                              // sum
          case 3 => if (lo.isNaN) null else lo     // min
          case 4 => if (hi.isNaN) null else hi     // max
        }
        i += 1
      }
      Row.fromSeq(out.toIndexedSeq)
    }

    override def bufferEncoder = Encoders.kryo[Cells]
    override def outputEncoder = Encoders.row(outSchema)
  }

  private def aggOrd(a: AggKind): Int = a match {
    case AggKind.Count => 0
    case AggKind.Avg   => 1
    case AggKind.Sum   => 2
    case AggKind.Min   => 3
    case AggKind.Max   => 4
  }

  def apply(df: DataFrame, spec: FeatureSpec): DataFrame = {
    val windows = spec.windows.toArray
    val nWin = windows.length
    val famColNames = spec.groupings.map(_.cols.toArray).toArray
    val dataCols = famColNames.flatten.distinct
    // input struct: value, time, then the distinct grouping columns
    val colPos = dataCols.zipWithIndex.map { case (c, i) => (c, i + 2) }.toMap
    val famColPos = famColNames.map(_.map(colPos))
    val famTupleIdx: Array[java.util.HashMap[String, Integer]] =
      spec.groupings.map { fam =>
        val m = new java.util.HashMap[String, Integer]()
        fam.valueTuples.zipWithIndex.foreach { case (t, i) =>
          m.put(t.mkString("\u0000"), Integer.valueOf(i))
        }
        m
      }.toArray
    val famCellOffset = spec.groupings.scanLeft(0)(_ + _.valueTuples.length * nWin)
      .init.toArray
    val nCells = spec.groupings.map(_.valueTuples.length * nWin).sum

    val featPlan = spec.features.map { f =>
      val base = famCellOffset(f.familyIdx) +
        famTupleIdx(f.familyIdx).get(f.tuple.mkString("\u0000")).intValue() * nWin
      (base, windows.indexOf(f.window), aggOrd(f.agg), 0)
    }.toArray

    val outSchema = StructType(spec.features.map { f =>
      StructField(f.name,
        if (f.agg == AggKind.Count) LongType else DoubleType, nullable = true)
    })

    val inSchema = StructType(
      StructField("v", DoubleType, nullable = true) +:
        StructField("t", LongType, nullable = false) +:
        dataCols.map(c => StructField(c, StringType, nullable = true)).toSeq)

    val agg = new FeatureAgg(windows, famTupleIdx, famCellOffset, famColPos,
      nCells, featPlan, outSchema)
    val u = udaf(agg, Encoders.row(inSchema))

    val inputs = (col(spec.valueCol).cast(DoubleType) +:
      col(spec.timeCol).cast(LongType) +: dataCols.map(col).toSeq)
    val wide = df
      .filter(col(spec.timeCol) <= lit(windows.max))
      .groupBy(col(spec.keyCol))
      .agg(u(inputs: _*).as("__f"))
    wide.select(col(spec.keyCol) +: spec.features.map(f => col(s"__f.${f.name}")): _*)
  }
}
