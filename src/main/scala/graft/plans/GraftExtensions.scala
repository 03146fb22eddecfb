package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension point (`spark.sql.extensions`-compatible and applied
  * by GraftSession directly): registers the engine's native expressions
  * so they're callable from both the Column API
  * (`call_function("graft_minhash_sig", ...)`) and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.minhashSig)
    ext.injectFunction(GraftExtensions.simhash)
    ext.injectFunction(GraftExtensions.bloomMightContain)
    ext.injectFunction(GraftExtensions.dot)
  }
}

object GraftExtensions {

  val minhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_sig"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_minhash_sig(hashes, k)")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"k must be an integer literal, got $other")
      }
      MinHashSignature(args.head, k)
    }
  )

  val simhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_simhash(hashes, bits)")
      val bits = args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"bits must be an integer literal, got $other")
      }
      SimHash(args.head, bits)
    }
  )

  val bloomMightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_might_contain"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_bloom_might_contain(value, sketch_bytes)")
      val bytes = args(1) match {
        case Literal(v: Array[Byte], org.apache.spark.sql.types.BinaryType) => v
        case other => throw new IllegalArgumentException(
          s"sketch_bytes must be a binary literal, got $other")
      }
      BloomMightContain(args.head, bytes)
    }
  )

  val dot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dot(a, b)")
      DotProduct(args(0), args(1))
    }
  )

  /** True once the functions are visible in the session's registry. */
  def registered(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.catalog.functionExists("graft_minhash_sig")
}
