package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeEncodeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "r")

  private def nativeEncode(c: org.apache.spark.sql.Column) =
    call_function("graft_bpe_encode", c,
      typedLit(merges.map(_._1)), typedLit(merges.map(_._2)))

  /** The columnar fold twin — Corpus.bpeEncode's fallback, inlined so
    * the equivalence claim doesn't depend on the dispatch flag.
    */
  private def hofEncode(text: org.apache.spark.sql.Column) =
    flatten(transform(split(text, " "), w => {
      val chars = when(length(w) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(w)),
          i => w.substr(i, lit(1))))
      merges.foldLeft(chars) { case (arr, (l, r)) =>
        aggregate(arr, array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s))))
      }
    }))

  test("classic merges: low/lower tokenize through the chained table") {
    val out = Seq((0L, "low lower lowest list"))
      .toDF("id", "text")
      .select(nativeEncode($"text").as("t"))
      .collect().head.getSeq[String](0)
    // low -> [low]; lower -> [low, er]; lowest -> [low, e, s, t];
    // list -> [l, i, s, t] (merge (l,o) doesn't fire without the o)
    assert(out == Seq("low", "low", "er", "low", "e", "s", "t",
      "l", "i", "s", "t"), out.mkString("|"))
  }

  test("native ≡ the aggregate-fold chain on random texts") {
    val rng = new java.util.SplittableRandom(17)
    val alphabet = "lower "
    val rows = (0 until 200).map { i =>
      val n = rng.nextInt(40)
      (i.toLong, (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "text")
    val native = df.select($"id", nativeEncode($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = df.select($"id", hofEncode($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows.forall { case (id, _) => native(id) == hof(id) },
      rows.collectFirst { case (id, s) if native(id) != hof(id) =>
        s"'$s': ${native(id)} vs ${hof(id)}" }.getOrElse(""))
  }

  test("runs fold left-to-right non-overlapping, multibyte is one symbol") {
    val m2 = Seq("a" -> "a")
    val out = Seq((0L, "aaaa aaa aéa"))
      .toDF("id", "text")
      .select(call_function("graft_bpe_encode", $"text",
        typedLit(m2.map(_._1)), typedLit(m2.map(_._2))).as("t"))
      .collect().head.getSeq[String](0)
    // aaaa -> [aa, aa]; aaa -> [aa, a]; aéa -> [a, é, a] (é blocks)
    assert(out == Seq("aa", "aa", "aa", "a", "a", "é", "a"),
      out.mkString("|"))
  }

  test("null text is NULL, empty text and empty words yield no tokens") {
    val df = Seq((0L, Some("")), (1L, Some("a  b")), (2L, None))
      .toDF("id", "text")
    val out = df.select($"id", nativeEncode($"text").as("t"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(out(0L) == Seq.empty, "empty text -> zero tokens")
    assert(out(1L) == Seq("a", "b"), "double space -> empty word skipped")
    assert(out(2L) == null, "null in, null out")
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, "lower slower flow")).toDF("id", "text")
    def run(): Seq[String] = df.select(nativeEncode($"text"))
      .collect().head.getSeq[String](0)
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("Corpus.bpeEncode output shape: counts and joined text") {
    val out = graft.llm.Corpus.bpeEncode(
        Seq((7L, "low lower")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().head
    assert(out.getLong(0) == 7L)
    assert(out.getInt(1) == 3) // [low] ++ [low, er]
    assert(out.getString(2) == "low low er")
  }
}
