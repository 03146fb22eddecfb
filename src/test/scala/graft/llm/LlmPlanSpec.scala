package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the LLM operators' scale claims: the corpus side of
  * every ANN probe reaches its bucket join WITHOUT shuffling (queries
  * broadcast), and the Bloom decontamination prefilter sits between the
  * scan and the confirm join so non-candidate grams die before any
  * exchange. Asserted on physical plan nodes with AQE off (its root is
  * opaque to collect), same pattern as features.PlanShapeSpec.
  */
class LlmPlanSpec extends AnyFunSuite with SparkSpec {

  private def withoutAqe[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def bhjs(df: DataFrame): Seq[BroadcastHashJoinExec] =
    df.queryExecution.executedPlan.collect { case j: BroadcastHashJoinExec => j }

  test("multi-table LSH: queries broadcast, corpus never shuffles into the bucket join") {
    withoutAqe {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 10)
      val df = Embeddings.lshTopKMultiTable(emb, q, "vec_id", "embedding",
        dim = 64, bits = 3, tables = 10, k = 3)
      val joins = bhjs(df)
      assert(joins.nonEmpty, "bucket join must plan as BroadcastHashJoin")
      val shufflesBelow = joins.head.collect { case e: ShuffleExchangeExec => e }.length
      assert(shufflesBelow == 0,
        "nothing below the bucket join may shuffle — the corpus side must stream from the scan")
    }
  }

  test("bloom decontamination: prefilter runs below the confirm join, above the scan") {
    withoutAqe {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val df = Decontamination.ngramOverlapBloom(
        docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text")
      // the returned frame is materialized+cached by the scoped contract;
      // assert on the UNDERLYING plan it was built from via a fresh build
      // with the cache dropped
      df.unpersist(blocking = true)
      val plan = df.queryExecution.executedPlan
      val joins = plan.collect { case j: BroadcastHashJoinExec => j }
      assert(joins.nonEmpty, "confirm semi-join must be broadcast at this scale")
      val semiJoin = joins.head
      val probeBelow = semiJoin.collectFirst {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.find(_.isInstanceOf[graft.plans.BloomMightContain]).isDefined => f
      }
      assert(probeBelow.isDefined,
        "the mightContain probe must filter grams BEFORE the confirm join")
      // only the STREAMED (corpus) side must be shuffle-free; the build
      // side legitimately shuffles for the eval grams' distinct()
      val streamed = semiJoin.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => semiJoin.left
        case _                                                  => semiJoin.right
      }
      val shufflesBelow = streamed.collect { case e: ShuffleExchangeExec => e }.length
      assert(shufflesBelow == 0,
        "no corpus-side shuffle before the confirm join at broadcast scale")
    }
  }

  test("sequence packing is one exchange: the per-source window, nothing else") {
    withoutAqe {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val plan = Corpus.packChunks(docs, "doc_id", "text", "source", 512)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.length == 1,
        s"packing must cost exactly the source-partition exchange, got ${shuffles.length}")
    }
  }

  test("bm25: query terms broadcast into tf, top-k pre-pruned before the rank exchange") {
    withoutAqe {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val plan = Retrieval.bm25TopK(docs, docs.filter(col("doc_id") < 5),
          "doc_id", "text", "doc_id", "text", k = 10)
        .queryExecution.executedPlan
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, "query-term join must plan as BroadcastHashJoin")
      // Spark's WindowGroupLimit must cut candidates to rnk<=k map-side
      // BEFORE the per-query exchange — the guard that keeps the
      // 5-partition rank window from receiving every matching doc
      val wgl = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
      }
      assert(wgl.size >= 2,
        s"expected partial+final WindowGroupLimit around the rank exchange, got ${wgl.size}")
    }
  }

  test("tfidf: the 1-row corpus-count join broadcasts, never a cartesian product") {
    withoutAqe {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val plan = Corpus.tfidfTopK(docs, "doc_id", "text", 3)
        .queryExecution.executedPlan
      val cartesians = plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cartesians.isEmpty, "N must arrive via broadcast, not a cartesian")
      val bnl = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }
      assert(bnl.nonEmpty, "expected the broadcast 1-row N join in the plan")
    }
  }
}
