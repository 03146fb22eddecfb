package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join — an operator Spark lacks
  * natively: for every left row, attach the payload of the right row
  * with the greatest `timeCol` <= the left row's time within the same
  * key (NULLs when no prior right row exists).
  *
  * Implementation is the SCALE-correct formulation: union both sides,
  * one shuffle by key, and a running `last(payload, ignoreNulls)` window
  * carry-forward — O(n log n) per key and NO pairwise row explosion.
  * The naive formulation (equi-join on key + `r.ts <= l.ts` filter +
  * row_number) multiplies hot keys into |left| x |right| intermediate
  * rows; a customer with 10k events on each side would expand to 10^8
  * rows before the window prunes them. This one never materializes a
  * pair.
  *
  * Ties: a right row AT the left row's timestamp matches (inclusive
  * bound) — right rows order before left rows at equal time. Semantics
  * mirror DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.t >= r.t`,
  * which the correctness gate uses as the oracle.
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      payloadCols: Seq[String], suffix: String = "_asof"): DataFrame = {
    val leftCols = left.columns.toSeq
    val nullTyped: String => Column =
      c => lit(null).cast(right.schema(c).dataType)

    // SQL ASOF semantics on NULLs: a right row with NULL key or NULL time
    // can never match (NULL compares false in `l.key = r.key AND
    // l.t >= r.t`). In the carry-forward formulation such a row would
    // instead sort NULLS FIRST inside the window (its payload carried
    // forward as a bogus match) and NULL keys would group together, so
    // drop them before the union — matching the DuckDB ASOF oracle.
    val rightClean = right.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)

    val leftPart = left.select(
      (Seq(col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        payloadCols.map(c => nullTyped(c).as(s"__p_$c"))): _*)
    val rightPart = rightClean.select(
      (Seq(col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c"))): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry ONE struct, not per-column lasts: a NULL payload FIELD in the
    // matching right row must surface as NULL, not fall back to an older
    // row's value. The struct is built only on right rows (NULL on left
    // rows), so last(ignoreNulls) lands on exactly one right row.
    val rowStruct = when(col("__side") === 0,
      struct(payloadCols.map(c => col(s"__p_$c").as(c)): _*))
    val carried = leftPart.unionByName(rightPart)
      .select((col("__side") +: leftCols.map(col)) :+
        last(rowStruct, ignoreNulls = true).over(w).as("__asof"): _*)

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(s"$c$suffix")): _*)
  }

  /** Forward as-of join: for every left row, the right row with the
    * SMALLEST `timeCol` >= the left row's time within the same key —
    * "next event at or after" (inclusive tie, mirroring [[backward]]).
    *
    * Implemented by time negation over the backward machinery: negate
    * both sides' times, run the backward carry-forward, restore the
    * original time column. Same single-shuffle O(n log n) shape, no
    * pairwise expansion; oracle = DuckDB `ASOF JOIN ... ON l.t <= r.t`.
    */
  def forward(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      payloadCols: Seq[String], suffix: String = "_asof"): DataFrame = {
    val negate: DataFrame => DataFrame =
      df => df.withColumn(timeCol, negateCol(df, timeCol))
    val joined = backward(negate(left), negate(right), keyCol, timeCol,
      payloadCols, suffix)
    joined.withColumn(timeCol, negateCol(joined, timeCol))
  }

  /** Negation that round-trips exactly for numeric and timestamp types
    * (timestamps negate through microseconds-since-epoch).
    */
  private def negateCol(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        timestamp_micros(-unix_micros(col(c)))
      case _ => -col(c)
    }
}
