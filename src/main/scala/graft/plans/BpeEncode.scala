package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: APPLY a trained BPE merge table to a text
  * column — the inference half of the tokenizer whose training half is
  * [[graft.llm.Corpus.bpeTrain]]. Words (space-split) start as character
  * symbols; each merge `(l, r) → l+r` is applied in rank order as the
  * SAME left-to-right greedy non-overlapping fold `bpeTrain` trains
  * with ("aaa" under (a,a) → ["aa","a"]); per-word token lists
  * concatenate in word order. Output: `array<string>` of subword tokens.
  *
  * Why native: the fold is expressible as a chain of `aggregate` HOFs
  * (one per merge — [[graft.llm.Corpus.bpeEncode]]'s fallback does
  * exactly that, and the equivalence spec pins this expression to it),
  * but a production tokenizer carries 10^4–10^5 merges and an
  * expression tree cannot nest that deep — this is the SURVEY.md §2
  * "(b) custom Catalyst Expression" escalation: the merge table rides
  * ONCE per stage binary (torrent broadcast), and each row runs one
  * tight loop per merge over the symbol array. NULL text → NULL
  * (UnaryExpression null-safe default).
  *
  * Character symbols are Unicode CODE POINTS, matching the `substr(w,
  * i, 1)` convention the columnar fold inherits from Spark's UTF8String
  * (a surrogate pair is one symbol, not two).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges != null, "graft_bpe_encode needs a merge table")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode needs a string value, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  // one flat array pair, resolved once per instance (not per row)
  @transient private lazy val lefts: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rights: Array[String] = merges.map(_._2).toArray

  /** Public for the generated code's reference-object call. */
  def encode(text: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    // split on the literal single space, keeping empty words — the
    // exact semantics of split(text, " ") the columnar fold sees
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      var syms = BpeEncode.codePointSymbols(words(w))
      var m = 0
      while (m < lefts.length && syms.length > 1) {
        syms = BpeEncode.applyMerge(syms, lefts(m), rights(m))
        m += 1
      }
      var i = 0
      while (i < syms.length) {
        out += UTF8String.fromString(syms(i)); i += 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** Word → one symbol per Unicode code point. */
  private[plans] def codePointSymbols(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One merge pass: the left-to-right greedy non-overlapping fold —
    * identical to bpeTrain's `aggregate` lambda (if the accumulated
    * last symbol is `l` and the incoming one is `r`, replace the last
    * with `l+r`; the merged symbol is strictly longer than `l`, so it
    * never re-matches as `l` in the same pass — which is exactly what
    * folds a run "aaa" to ["aa","a"], never overlapping).
    */
  private[plans] def applyMerge(
      syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val merged = l + r
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == l && syms(i) == r)
        out(out.length - 1) = merged
      else out += syms(i)
      i += 1
    }
    out.toArray
  }
}
