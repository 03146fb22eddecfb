package graft.plans

import graft.SparkSpec
import graft.llm.Decontamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomMightContainSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def sketchOf(members: Seq[String]): Array[Byte] = {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(members.size.toLong, 0.01)
    members.foreach(bloom.putString)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  test("probe ≡ the UDF it replaced; no false negatives; NULL drops") {
    val members = (0 until 500).map(i => s"gram $i of the eval set")
    val bytes = sketchOf(members)
    val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
    val probes = members.take(100).map(Option(_)) ++
      (0 until 400).map(i => Some(s"corpus-only gram $i")) :+ (None: Option[String])
    val df = probes.toDF("g")
    val viaExpr = df
      .filter(call_function("graft_bloom_might_contain", $"g", lit(bytes)))
      .collect().map(_.getString(0)).toSet
    val mightContain = udf((g: String) => g != null && bloom.mightContainString(g))
    val viaUdf = df.filter(mightContain($"g")).collect().map(_.getString(0)).toSet
    assert(viaExpr == viaUdf)
    assert(members.take(100).toSet.subsetOf(viaExpr), "bloom false negative")
  }

  test("codegen and interpreted paths agree") {
    val bytes = sketchOf(Seq("alpha", "beta"))
    val df = Seq("alpha", "beta", "gamma").toDF("g")
    def run(): Seq[String] = df
      .filter(call_function("graft_bloom_might_contain", $"g", lit(bytes)))
      .collect().map(_.getString(0)).toSeq.sorted
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("probe stays inside whole-stage codegen (no UDF node in the plan)") {
    val bytes = sketchOf(Seq("g1"))
    // spark.range (not a local relation): ConvertToLocalRelation would
    // otherwise fold the probe into a LocalTableScan at planning time
    val plan = spark.range(100)
      .select(concat(lit("g"), $"id").as("g"))
      .filter(call_function("graft_bloom_might_contain", $"g", lit(bytes)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF("),
      s"UDF node leaked into the bloom probe plan:\n$plan")
    // `*(n)` is how executedPlan.toString marks a WholeStageCodegen span
    assert("""\*\(\d+\) Filter graft_bloom_might_contain""".r.findFirstIn(plan).isDefined,
      s"probe fell out of codegen:\n$plan")
  }

  test("content-based equality: identical sketches canonicalize, different don't") {
    val bytes = sketchOf(Seq("alpha", "beta"))
    val child = org.apache.spark.sql.catalyst.expressions.Literal
      .create("alpha", org.apache.spark.sql.types.StringType)
    val a = BloomMightContain(child, bytes)
    val b = BloomMightContain(child, bytes.clone()) // same content, new array
    val c = BloomMightContain(child, sketchOf(Seq("gamma")))
    assert(a == b && a.hashCode == b.hashCode,
      "same-content sketches must compare equal (cache/exchange reuse)")
    assert(a.semanticEquals(b))
    assert(a != c && !a.semanticEquals(c))
  }

  test("ngramOverlapBloom falls back to a UDF probe when the native fn is absent") {
    // newSession + dropFunction simulates a plain session (no
    // GraftExtensions): registered() must answer false for THIS session
    // (per-session cache) and the operator must still return the exact
    // semi-join result via the UDF probe instead of failing analysis.
    val plain = spark.newSession()
    GraftExtensions.allFunctionNames.foreach(n => plain.sessionState.functionRegistry
      .dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
    assert(!GraftExtensions.registered(plain))
    assert(GraftExtensions.registered(spark), "original session must stay registered")
    val docs = plain.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different words with no overlap to speak of here now"),
      (3L, "the quick brown fox jumps over the lazy dog again and again")
    )).toDF("doc_id", "text")
    val out = Decontamination.ngramOverlapBloom(
      docs, docs.filter(col("doc_id") === 1L), "doc_id", "text", n = 8)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    out.unpersist()
  }

  test("ngramOverlapBloom carries no UDF and matches the exact semi-join form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "completely different words with no overlap to speak of here now", "en"),
      (3L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (4L, "yet another unrelated document body of filler text goes right here", "de")
    ).toDF("doc_id", "text", "lang")
    val evalDocs = docs.filter($"doc_id" === 1L)
    val out = Decontamination.ngramOverlapBloom(
      docs, evalDocs, "doc_id", "text", keepCols = Seq("lang"), n = 8)
    // docs 1 and 3 share 8-gram content with the eval doc; 2 and 4 don't
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // the analyzed plan retains the full pre-cache tree: the probe must be
    // the native expression, with no Scala UDF anywhere
    val analyzed = out.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_bloom_might_contain"), analyzed)
    assert(!analyzed.contains("UDF("), s"ScalaUDF leaked:\n$analyzed")
    out.unpersist()
  }
}
