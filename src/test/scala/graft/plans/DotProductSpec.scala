package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(
      transform(a, x => x.cast("double")), transform(b, x => x.cast("double")),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("native kernel ≡ the HOF fold bit-for-bit on random float arrays") {
    val rng = new java.util.SplittableRandom(13)
    val rows = (0 until 300).map { i =>
      val n = 1 + rng.nextInt(96)
      (i.toLong,
        Seq.fill(n)(rng.nextDouble().toFloat * 2 - 1),
        Seq.fill(n)(rng.nextDouble().toFloat * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val native = df.select($"id", call_function("graft_dot", $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = df.select($"id", hofDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bit-identical, not approximately equal: same left-to-right fold
    assert(rows.forall { case (id, _, _) =>
      java.lang.Double.doubleToLongBits(native(id)) ==
        java.lang.Double.doubleToLongBits(hof(id)) })
  }

  test("mismatched lengths and empty arrays match the HOF semantics") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f)),        // length mismatch -> NULL
      (2L, Seq.empty[Float], Seq.empty[Float]) // empty -> 0.0
    ).toDF("id", "a", "b")
    val out = df.select($"id", call_function("graft_dot", $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(0.0))
  }

  test("integer and long arrays widen to double like the HOF cast chain") {
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq(4, 5, 6)),
      (2L, Seq(-7, 0, 9), Seq(2, 2, 2))
    ).toDF("id", "ai", "bi")
      .withColumn("al", transform($"ai", x => x.cast("long")))
      .withColumn("bl", transform($"bi", x => x.cast("long")))
    val native = df.select($"id",
      call_function("graft_dot", $"ai", $"bi").as("dii"),
      call_function("graft_dot", $"al", $"bi").as("dli"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val hof = df.select($"id", hofDot($"ai", $"bi").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native(1L) == ((32.0, 32.0)) && hof(1L) == 32.0)
    assert(native(2L) == ((4.0, 4.0)) && hof(2L) == 4.0)
    // Embeddings.dot must route integer arrays through the native kernel
    // without failing analysis (the pre-widening regression)
    val viaApi = df.select(graft.llm.Embeddings.dot($"ai", $"bi").as("d"))
      .collect().map(_.getDouble(0)).toSet
    assert(viaApi == Set(32.0, 4.0))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(0.5f, -0.25f, 2.0f), Seq(4.0f, 8.0f, 0.125f))).toDF("id", "a", "b")
    def run(): Double = df.select(call_function("graft_dot", $"a", $"b"))
      .collect().head.getDouble(0)
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
