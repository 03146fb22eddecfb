package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: co-cluster rows by MULTIPLE
  * dimensions so parquet min/max statistics prune box queries on any of
  * them — the `OPTIMIZE ZORDER BY` of lakehouse table maintenance,
  * expressed as plain Spark.
  *
  * Why a 100-TB table wants it: a sort by `(a, b)` gives perfect
  * pruning on `a` and none on `b`; interleaving the bits of
  * grid-normalized `a` and `b` into one sort key gives every file a
  * hypercube-ish slice of BOTH ranges, so a predicate on either
  * dimension (or a box on both) skips most files/row-groups by their
  * footer stats alone. The write is one range exchange on the z-value
  * (the same shuffle a plain global sort pays) plus an in-partition
  * sort — no extra passes.
  *
  * Everything is integer/IEEE-deterministic: grid cells come from
  * `floor((x - min) * (2^bits - 1) / (max - min))` evaluated in f64
  * (exact products at these magnitudes, identical IEEE division in any
  * engine), bit interleaving is shifts and ORs — so the z-value has an
  * exact cross-engine SQL twin ([[zSql]]) and the layout is
  * reproducible run to run.
  */
object ZOrder {

  /** Grid-normalize a (non-negative-range) numeric column to
    * [0, 2^bits) given its min/max; a constant column collapses to
    * cell 0. Nulls are pinned to cell 0 (they sort first, as in an
    * ordinary sort layout).
    */
  def gridCell(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val scale = lit(((1L << bits) - 1).toDouble)
    when(mx > mn,
      floor((coalesce(x, mn) - mn).cast("double") * scale / (mx - mn).cast("double")))
      .otherwise(lit(0L)).cast("long")
  }

  /** Interleave `bits` bits of each grid cell into the Morton key:
    * bit `i` of cell `j` lands at position `i * cells + j`. Total bits
    * must fit a signed long.
    */
  def zValue(cells: Seq[Column], bits: Int): Column = {
    require(cells.nonEmpty && bits * cells.size <= 63,
      s"z-value needs 1..63 interleaved bits: ${cells.size} x $bits")
    var acc: Column = lit(0L)
    for (i <- 0 until bits; j <- cells.indices)
      acc = acc.bitwiseOR(
        shiftleft(shiftright(cells(j), i).bitwiseAND(lit(1L)), i * cells.size + j))
    acc
  }

  /** SQL twin of [[gridCell]] ∘ [[zValue]] for an oracle engine:
    * `colExprs` are the dimension expressions, `mnExprs`/`mxExprs`
    * their min/max (same rows!). Byte-identical semantics: same f64
    * products and division, same shifts.
    */
  def zSql(colExprs: Seq[String], mnExprs: Seq[String], mxExprs: Seq[String],
      bits: Int): String = {
    val scale = ((1L << bits) - 1).toString + ".0"
    val cells = colExprs.lazyZip(mnExprs).lazyZip(mxExprs).map { (x, mn, mx) =>
      s"(CASE WHEN $mx > $mn THEN CAST(floor(CAST(coalesce($x, $mn) - $mn AS DOUBLE)" +
        s" * $scale / CAST($mx - $mn AS DOUBLE)) AS BIGINT) ELSE 0 END)"
    }
    val terms = for (i <- 0 until bits; j <- cells.indices)
      yield s"(((${cells(j)} >> $i) & 1) << ${i * cells.size + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Rewrite `df` as `files` z-ordered parquet files at `path`: global
    * min/max per dimension (one tiny aggregate, broadcast back as a
    * 1-row join — no driver collect), z-value per row, range exchange
    * on z into `files` non-overlapping key ranges, in-partition sort,
    * write. The z-value rides along as column `zval` so readers,
    * oracles and layout audits can verify placement without
    * re-deriving the stats.
    */
  def write(df: DataFrame, zCols: Seq[String], bits: Int,
      path: String, files: Int): Unit = {
    val statCols = zCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(s"__mn$i"), max(col(c)).as(s"__mx$i"))
    }
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val cells = zCols.zipWithIndex.map { case (c, i) =>
      gridCell(col(c), col(s"__mn$i"), col(s"__mx$i"), bits)
    }
    df.crossJoin(broadcast(stats))
      .withColumn("zval", zValue(cells, bits))
      .drop(zCols.indices.flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(path)
  }
}
