package graft.datagen

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocGenSpec extends AnyFunSuite with SparkSpec {

  test("corpus is deterministic and has the declared shape") {
    val a = DocGen.docs(spark, 500).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = DocGen.docs(spark, 500).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "same args must produce a byte-identical corpus")
    assert(a.size == 500)
    // token lengths inside the declared band (plus the 12-token header)
    assert(a.values.forall { t => val n = t.split(" ").length; n >= 40 && n < 172 })
    // boilerplate on ~5%
    val hdr = DocGen.Boilerplate.mkString(" ")
    assert(a.count(_._2.startsWith(hdr)) == 25)
    // planted near-dup: differs from predecessor in exactly one token
    val d0 = a(10L).split(" ")
    val d1 = a(11L).split(" ")
    assert(d0.length == d1.length)
    assert(d0.zip(d1).count { case (x, y) => x != y } == 1)
  }

  test("minhash dedup finds the planted near-dup pairs at generator scale") {
    val docs = DocGen.docs(spark, 1000)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 1000L by 10L).map(k => (k, k + 1)).toSet
    val found = planted.intersect(pairs)
    // banding is probabilistic per pair but j≈0.97 pairs sit far up the
    // S-curve; near-total recall is the expected behavior, not luck
    assert(found.size >= 95, s"only ${found.size}/100 planted pairs found")
    // and the boilerplate flood must not explode the candidate set
    assert(pairs.size <= 400, s"pair set exploded: ${pairs.size}")
  }
}
