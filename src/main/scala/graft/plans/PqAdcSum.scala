package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the PQ asymmetric-distance (ADC) scan
  * body — `sum over s of qt[s*stride + codes[s]]` as ONE tight integer
  * loop over the code array and the query's dense distance table.
  *
  * The Column formulation (`aggregate(zip_with(codes, sequence, probe),
  * 0L, _+_)`, [[graft.llm.Quantization]]) routes every subspace through
  * interpreted higher-order-function lambdas — measured 1.8x SLOWER
  * than the full-precision `graft_dot` scan it is meant to undercut
  * (and the map-typed variant 3.9x slower: Catalyst map `element_at`
  * is a linear scan per lookup). This is the same §2 "(b) custom
  * Catalyst Expression" escalation as [[DotProduct]]: m array reads and
  * adds per row, whole-stage-codegen'd. Registered as SQL function
  * `graft_pq_adc(codes, qt, stride)` by [[GraftExtensions]].
  *
  * NULL semantics match the HOF chain: NULL input array → NULL; a NULL
  * element or an out-of-table index (element_at past the end) → NULL.
  * Integer sums are accumulation-order-free, so results are exactly the
  * fold's.
  */
case class PqAdcSum(left: Expression, right: Expression, stride: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _))
        if PqAdcSum.integral(l) && PqAdcSum.integral(r) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc needs two arrays of an integral element type, got ${l.simpleString} / ${r.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val qt = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = qt.numElements()
    val ct = elemType(left)
    val qtType = elemType(right)
    var acc = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val idx = s.toLong * stride + PqAdcSum.asLong(codes, s, ct)
      if (idx < 0L || idx >= n) return null
      if (qt.isNullAt(idx.toInt)) return null
      acc += PqAdcSum.asLong(qt, idx.toInt, qtType)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val getCode = PqAdcSum.genGet(a, s, elemType(left))
      val getQt = PqAdcSum.genGet(b, s"(int) $idx", elemType(right))
      s"""
         |int $m = $a.numElements();
         |int $n = $b.numElements();
         |long $acc = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  if ($a.isNullAt($s)) { ${ev.isNull} = true; break; }
         |  long $idx = (long) $s * ${stride}L + ($getCode);
         |  if ($idx < 0L || $idx >= $n || $b.isNullAt((int) $idx)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += ($getQt);
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcSum {

  private[plans] def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLong(a: ArrayData, i: Int, t: DataType): Long = t match {
    case LongType => a.getLong(i)
    case IntegerType => a.getInt(i).toLong
    case ShortType => a.getShort(i).toLong
    case ByteType => a.getByte(i).toLong
  }

  private def genGet(arr: String, i: String, t: DataType): String = t match {
    case LongType => s"$arr.getLong($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case ByteType => s"(long) $arr.getByte($i)"
  }
}
