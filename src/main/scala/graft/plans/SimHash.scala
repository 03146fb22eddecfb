package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash kernel: bit j of the result is set iff more input
  * hashes have bit j set than not (ties -> 0). One pass over the token
  * hashes; the Column-function twin (TextFunctions.simhash) re-traverses
  * the array once per bit through `aggregate` HOF plumbing. Same values
  * (pinned by SimHashSpec), registered as `graft_simhash(hashes, bits)`
  * by [[GraftExtensions]].
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in 1..63")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < bits) {
          votes(j) += ((h >> j) & 1L) * 2L - 1L
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |long[] $votes = new long[$bits];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $bits; $j++) {
         |      $votes[$j] += (($h >> $j) & 1L) * 2L - 1L;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) ${ev.value} |= 1L << $j;
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
