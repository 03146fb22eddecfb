package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: probe a driver-built Bloom filter sketch
  * with a string column — the codegen'd replacement for the one
  * hot-path Scala UDF the engine used to carry
  * (`Decontamination.ngramOverlapBloom`'s `mightContain`). Spark's own
  * `BloomFilterMightContain` is internal to runtime join filtering and
  * not constructible over a caller-supplied sketch, hence this
  * expression. Registered as SQL function
  * `graft_bloom_might_contain(value, sketch_bytes)` by
  * [[GraftExtensions]] (the sketch travels as a binary literal).
  *
  * Semantics match `BloomFilter.mightContainString`: the probe hashes
  * the value's UTF-8 bytes (`UTF8String.getBytes` IS those bytes, so
  * the codegen path skips the `String` allocation the UDF paid per
  * row). NULL in → NULL out (`UnaryExpression` null-safe default),
  * which under `filter()` drops NULLs exactly like the old
  * `g != null && ...` UDF guard.
  *
  * Scale shape: the serialized sketch is a plan constant, and Spark
  * ships each stage's task binary via torrent broadcast ONCE per
  * executor — so a multi-MB sketch costs one broadcast, not
  * per-task shipping. The filter is deserialized lazily once per JVM
  * (transient lazy val) and probed lock-free (reads only).
  */
case class BloomMightContain(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  require(sketchBytes != null && sketchBytes.nonEmpty,
    "graft_bloom_might_contain needs a non-empty serialized sketch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a string value, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(sketchBytes)

  /** Public for the generated code's reference-object call. */
  def probe(utf8Bytes: Array[Byte]): Boolean = bloom.mightContainBinary(utf8Bytes)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
