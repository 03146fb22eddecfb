package graft.plans

import graft.SparkSpec
import graft.llm.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSignatureSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val k = 12

  test("native expression is registered by GraftExtensions and SQL-callable") {
    assert(GraftExtensions.registered(spark))
    val r = spark.sql(s"SELECT graft_minhash_sig(array(5L, 99L, 12345L), $k) AS s")
      .collect().head.getSeq[Long](0)
    assert(r.length == k)
  }

  test("native one-pass kernel ≡ the HOF formulation on random inputs") {
    val rng = new java.util.SplittableRandom(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(50))(rng.nextLong(1L << 32)))
    }
    val df = rows.toDF("id", "hs")
    val native = df.select($"id",
        call_function("graft_minhash_sig", $"hs", lit(k)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = df.select($"id",
        TextFunctions.minhashSignature($"hs", k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof)
  }

  test("native simhash kernel ≡ the HOF formulation on random inputs") {
    val rng = new java.util.SplittableRandom(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(60))(rng.nextLong(1L << 32)))
    }
    val df = rows.toDF("id", "hs")
    val native = df.select($"id", call_function("graft_simhash", $"hs", lit(32)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.select($"id", TextFunctions.simhash($"hs").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof)
  }

  test("shingle producers never emit an empty array (native/HOF divergence guard)") {
    // On empty input the native kernel emits Long.MaxValue slots while the
    // HOF formulation (array_min of empty) yields NULLs — the documented
    // precondition is that no shingle producer ever feeds either an empty
    // array. Pin it on the degenerate inputs: empty string, one char, one
    // token, fewer tokens than the shingle width.
    val df = Seq((0L, ""), (1L, "x"), (2L, "one"), (3L, "two words"))
      .toDF("id", "text")
    val sizes = df.select(
        size(TextFunctions.wordShingles(TextFunctions.tokens($"text"), 3)).as("w"),
        size(TextFunctions.charShingles($"text", 4)).as("c"))
      .collect().flatMap(r => Seq(r.getInt(0), r.getInt(1)))
    assert(sizes.forall(_ >= 1), s"empty shingle array produced: ${sizes.toSeq}")
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, Seq(7L, 8L, 9L))).toDF("id", "hs")
    def run(): Seq[Long] = df
      .select(call_function("graft_minhash_sig", $"hs", lit(k)).as("sig"))
      .collect().head.getSeq[Long](0)
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
