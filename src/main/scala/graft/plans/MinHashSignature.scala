package graft.plans

import graft.llm.TextFunctions
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the k-slot universal-hash MinHash
  * signature `sig[j] = min_i (a_j * h_i + b_j) mod P` over an
  * `array<long>` of shingle hashes, in ONE pass over the array.
  *
  * The Column-function formulation (k × `array_min(transform(...))`,
  * TextFunctions.lshBandKeysFromHashes) re-traverses the array k times
  * through per-element lambda plumbing; this expression is the
  * SURVEY.md §2 "(b) custom Catalyst Expression" escalation: same
  * semantics (same a/b/P constants — the DuckDB oracle is unchanged),
  * whole-stage-codegen'd via [[doGenCode]] into a tight nested loop.
  * Registered as SQL function `graft_minhash_sig(hashes, k)` by
  * [[GraftExtensions]].
  *
  * Empty/all-null input arrays yield Long.MaxValue slots (callers
  * guarantee ≥1 shingle; documented rather than null-propagated).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig needs array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private lazy val as: Array[Long] = Array.tabulate(k)(TextFunctions.minhashA)
  private lazy val bs: Array[Long] = Array.tabulate(k)(TextFunctions.minhashB)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % TextFunctions.MinHashP
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${TextFunctions.MinHashP}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
