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
    ext.injectFunction(GraftExtensions.pqAdc)
    ext.injectFunction(GraftExtensions.bpeEncode)
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

  val pqAdc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_pq_adc"),
    new ExpressionInfo(classOf[PqAdcSum].getName, "graft_pq_adc"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_pq_adc(codes, qt, stride)")
      val stride = args(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"stride must be an integer literal, got $other")
      }
      PqAdcSum(args(0), args(1), stride)
    }
  )

  val bpeEncode: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_encode"),
    new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe_encode"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_bpe_encode(text, lefts, rights)")
      def strings(e: Expression, what: String): Seq[String] = e match {
        case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType, _)) =>
          v.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        case other => throw new IllegalArgumentException(
          s"$what must be an array<string> literal, got $other")
      }
      val l = strings(args(1), "lefts")
      val r = strings(args(2), "rights")
      require(l.length == r.length,
        s"lefts/rights must pair up, got ${l.length}/${r.length}")
      BpeEncode(args.head, l.zip(r))
    }
  )

  /** Every function [[GraftExtensions.apply]] injects. */
  val allFunctionNames: Seq[String] =
    Seq("graft_minhash_sig", "graft_simhash", "graft_bloom_might_contain",
      "graft_dot", "graft_pq_adc", "graft_bpe_encode")

  /** Per-session answer cache: dispatch sites construct many Columns per
    * plan (`Embeddings.dot` builds bits×dot calls for one projection),
    * and a catalog `functionExists` lookup per Column would dominate
    * plan construction. Weak keys so a closed session doesn't pin.
    * Only a positive answer is cached — extensions are applied at
    * session build, but a plain session that registers the functions
    * later (tests do) must not be stuck on a stale `false`.
    */
  private val registeredCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  /** True once ALL the engine's native functions are visible in the
    * session's registry — checked on every name actually dispatched
    * (not a single proxy), so a partially-registered session falls back
    * to the HOF/UDF twins rather than failing analysis.
    */
  def registered(spark: org.apache.spark.sql.SparkSession): Boolean = {
    if (registeredCache.get(spark) != null) true
    else {
      val ok = allFunctionNames.forall(spark.catalog.functionExists)
      if (ok) registeredCache.put(spark, java.lang.Boolean.TRUE)
      ok
    }
  }
}
