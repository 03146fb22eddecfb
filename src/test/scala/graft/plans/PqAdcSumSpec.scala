package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqAdcSumSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val stride = 100

  /** The HOF twin Quantization's fallback path runs (1-based element_at
    * over the same dense 0-based slot layout).
    */
  private def hofAdc(m: Int)(codes: org.apache.spark.sql.Column,
      qt: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(qt,
          (s.cast("long") * lit(stride.toLong) + c + lit(1L)).cast("int"))),
      lit(0L), (a, x) => a + x)

  test("native kernel ≡ the HOF fold on random codes and tables") {
    val rng = new java.util.SplittableRandom(29)
    val m = 16
    val rows = (0 until 300).map { i =>
      (i.toLong,
        Seq.fill(m)(rng.nextInt(32).toLong),
        Seq.fill(m * stride)(rng.nextLong(0L, 20000L)))
    }
    val df = rows.toDF("id", "codes", "qt")
    val native = df.select($"id",
        call_function("graft_pq_adc", $"codes", $"qt", lit(stride)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.select($"id", hofAdc(m)($"codes", $"qt").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall { case (id, _, _) => native(id) == hof(id) })
  }

  test("int codes widen like long codes; empty codes sum to zero") {
    val df = Seq(
      (1L, Seq(2, 0, 1), (0 until 3 * stride).map(_.toLong)),
      (2L, Seq.empty[Int], (0 until stride).map(_.toLong))
    ).toDF("id", "ci", "qt")
    val out = df.select($"id",
        call_function("graft_pq_adc", $"ci", $"qt", lit(stride)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // slots: 0*100+2=2, 1*100+0=100, 2*100+1=201 -> 2+100+201
    assert(out(1L) == 303L)
    assert(out(2L) == 0L)
  }

  test("out-of-table index and null inputs yield NULL, not a crash") {
    val qt = (0 until stride).map(_.toLong)
    val df = Seq(
      (1L, Some(Seq(5000L)), Some(qt)), // 0*100+5000 past the end
      (2L, None, Some(qt)),
      (3L, Some(Seq(1L)), None)
    ).toDF("id", "codes", "qt")
    val out = df.select($"id",
        call_function("graft_pq_adc", $"codes", $"qt", lit(stride)).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(3L, 7L), (0 until 2 * stride).map(i => (i * 13).toLong)))
      .toDF("id", "codes", "qt")
    def run(): Long = df.select(
        call_function("graft_pq_adc", $"codes", $"qt", lit(stride)))
      .collect().head.getLong(0)
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // slots 3 and 100+7 -> 13*(3 + 107)
    assert(withCodegen == 13L * 110L)
  }

  test("the ADC scan stays inside whole-stage codegen") {
    val codes = spark.range(0, 100).select($"id",
      transform(sequence(lit(0), lit(15)),
        s => pmod(hash($"id" + s), lit(32)).cast("long")).as("codes"))
    val qt = typedLit((0 until 16 * stride).map(_.toLong))
    val plan = codes
      .select(call_function("graft_pq_adc", $"codes", qt, lit(stride)).as("d"))
      .filter($"d" > 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected a WholeStageCodegen span:\n$plan")
  }
}
