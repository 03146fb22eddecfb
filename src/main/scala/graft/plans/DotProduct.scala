package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: double-precision dot product of two
  * numeric arrays in ONE tight loop.
  *
  * The Column formulation (`aggregate(zip_with(cast, cast, _*_), 0.0,
  * _+_)`, [[graft.llm.Embeddings.dot]]) routes every element through
  * three higher-order-function lambdas; this is the SURVEY.md §2
  * "(b) custom Catalyst Expression" escalation for the ANN hot path —
  * the same left-to-right `acc + x_i*y_i` IEEE fold (identical result
  * bits, so every DuckDB oracle splice is unchanged), whole-stage-
  * codegen'd via [[doGenCode]]. Registered as SQL function
  * `graft_dot(a, b)` by [[GraftExtensions]].
  *
  * NULL semantics match the HOF chain: NULL input array → NULL;
  * mismatched lengths or a NULL element → NULL (zip_with pads the
  * shorter side with NULL and `null * y` poisons the sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Any fixed-width numeric element type is accepted and widened to
    * double inside the loop — the exact semantics the HOF chain gets
    * from its up-front `cast("double")`, without materializing a cast
    * array per row. (The HOF fallback path accepts the same set, so
    * callers behave identically whether or not GraftExtensions is
    * registered.)
    */
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _))
        if DotProduct.widens(l) && DotProduct.widens(r) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two arrays of a numeric element type, got ${l.simpleString} / ${r.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xt = elemType(left)
    val yt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += DotProduct.asDouble(x, i, xt) * DotProduct.asDouble(y, i, yt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = DotProduct.genGet(a, i, elemType(left))
      val getY = DotProduct.genGet(b, i, elemType(right))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ($getX) * ($getY);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  private[plans] def widens(t: DataType): Boolean = t match {
    case FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asDouble(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
  }

  private def genGet(arr: String, i: String, t: DataType): String = t match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
  }
}
