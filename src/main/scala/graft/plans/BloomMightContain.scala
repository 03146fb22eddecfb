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
  * executor — so a multi-MB sketch costs one broadcast, not per-task
  * shipping. Each task deserializes its own reference object, so the
  * `BloomFilter.readFrom` cost is amortized by an executor-side cache
  * keyed on the sketch digest ([[BloomMightContain.cachedFilter]]) —
  * one deserialization per sketch per JVM, probed lock-free after.
  */
case class BloomMightContain(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  require(sketchBytes != null && sketchBytes.nonEmpty,
    "graft_bloom_might_contain needs a non-empty serialized sketch")

  // Array[Byte] compares by reference; content-based equality keeps
  // semanticEquals/canonicalization (cache + exchange reuse) working
  // for otherwise-identical probes rebuilt from the same sketch.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      // hash first: equals is called from planning-time map lookups, and
      // a full Arrays.equals over a multi-MB sketch should only run when
      // the O(1) cached hashes already agree
      b.child == child && b.hashCode == hashCode &&
        java.util.Arrays.equals(b.sketchBytes, sketchBytes)
    case _ => false
  }
  // Catalyst calls hashCode repeatedly during rule batches and
  // canonicalization — cache the O(n) array hash once per instance
  @transient private lazy val sketchHash: Int =
    java.util.Arrays.hashCode(sketchBytes)
  override def hashCode(): Int = 31 * child.hashCode() + sketchHash

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a string value, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomMightContain.cachedFilter(sketchBytes)

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

object BloomMightContain {

  /** JVM-wide filter cache keyed on the sketch's SHA-256: every task's
    * reference object shares one deserialized `BloomFilter` per distinct
    * sketch instead of paying `readFrom` on a multi-MB payload per task.
    * Hashing the bytes is ~GB/s; `readFrom` copies and re-allocates the
    * whole bit array. Values are SOFT references: a long-lived executor
    * running many distinct decontamination sketches doesn't pin
    * N × sketch-size of heap forever — the GC reclaims idle filters
    * under pressure and the next probe re-deserializes.
    */
  private val filters = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[BloomFilter]]()

  private[plans] def cachedFilter(bytes: Array[Byte]): BloomFilter = {
    val digest = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes))
    val ref = filters.get(digest)
    val cached = if (ref == null) null else ref.get()
    if (cached != null) cached
    else {
      val fresh = BloomFilter.readFrom(bytes)
      filters.put(digest, new java.lang.ref.SoftReference(fresh))
      fresh
    }
  }
}
