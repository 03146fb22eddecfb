package graft.features

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties of the FeatureSpec algebra (driver-side model
  * code — no Spark session needed, so these run in milliseconds).
  */
class FeatureSpecPropsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val genValues: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct.take(5))

  test("GroupingFamily.cross enumerates the full cartesian product, row-major") {
    check(Prop.forAll(genValues, genValues) { (vs1, vs2) =>
      val fam = GroupingFamily.cross("c1" -> vs1, "c2" -> vs2)
      fam.valueTuples.length == vs1.length * vs2.length &&
        fam.valueTuples.distinct.length == fam.valueTuples.length &&
        fam.valueTuples.head == Seq(vs1.head, vs2.head) &&
        fam.valueTuples.last == Seq(vs1.last, vs2.last)
    })
  }

  test("features enumerate |tuples| x |windows| x |aggs| with unique canonical names") {
    val genWins = Gen.nonEmptyListOf(Gen.choose(1, 1000)).map(_.distinct.sorted.take(6))
    check(Prop.forAll(genValues, genWins) { (vs, wins) =>
      val spec = FeatureSpec("k", "v", "t", wins,
        Seq(GroupingFamily(Seq("g"), vs.map(Seq(_)))))
      spec.features.length == vs.length * wins.length * AggKind.All.length &&
        spec.outputColumns.distinct.length == spec.outputColumns.length
    })
  }

  test("the reference spec is exactly the published 2,080 columns") {
    assert(FeatureSpec.reference.features.length == 2080)
    assert(FeatureSpec.reference.outputColumns.length == 2081)
  }

  test("unsorted windows are rejected") {
    intercept[IllegalArgumentException] {
      FeatureSpec("k", "v", "t", Seq(14, 7),
        Seq(GroupingFamily(Seq("g"), Seq(Seq("a")))))
    }
  }

  test("oracle SQL quotes every feature column it emits") {
    val sql = FeatureSpec.reference.toOracleSql("trx")
    assert(FeatureSpec.reference.features.forall(f => sql.contains(s""""${f.name}"""")))
  }
}
