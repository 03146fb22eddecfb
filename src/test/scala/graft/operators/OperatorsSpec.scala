package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val left = (1 to 1000).map(i => (i % 3L, i.toLong)).toDF("k", "v")
    val right = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(left, right, "k", 8).select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 5000).map(i => (i % 5L, (i % 97).toDouble)).toDF("k", "v")
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin.saltedCountSum(df, "k", "v", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("as-of backward join matches the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L), // key 10 at t=100,205,300
      (4L, 20L, 50L)                                     // key 20, no clicks before
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L, "a"), (10L, 200L, "b"), (10L, 400L, "c"),
      (20L, 60L, "late")
    ).toDF("k", "t", "payload")
    val out = AsOfJoin.backward(left, right, "k", "t", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "a", "tie at t=100 matches inclusively")
    assert(out(2L) == "b", "t=205 takes the t=200 row")
    assert(out(3L) == "b", "t=300 still b (c is in the future)")
    assert(out(4L) == null, "no right row at or before -> NULL")
  }

  test("forward as-of join matches the earliest right row at-or-after each left row") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 500L)
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L, "a"), (10L, 200L, "b"), (10L, 400L, "c")
    ).toDF("k", "t", "payload")
    val out = AsOfJoin.forward(left, right, "k", "t", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "a", "tie at t=100 matches inclusively")
    assert(out(2L) == "c", "t=250 takes the next click at 400")
    assert(out(3L) == null, "nothing after t=500 -> NULL")
    // time column round-trips unchanged through the negation
    val ts = AsOfJoin.forward(left, right, "k", "t", Seq("payload"))
      .collect().map(_.getLong(2)).toSet
    assert(ts == Set(100L, 250L, 500L))
  }

  test("as-of join ignores right rows with NULL key or NULL time (SQL ASOF semantics)") {
    val left = Seq((1L, 10L, 300L)).toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), None: Option[Long], "null-time"),   // would sort NULLS FIRST and leak
      (None: Option[Long], Some(100L), "null-key"),
      (Some(10L), Some(200L), "real")
    ).toDF("k", "t", "payload")
    val r = AsOfJoin.backward(left, right, "k", "t", Seq("payload")).collect().head
    assert(r.getString(3) == "real", s"NULL right rows must never match, got ${r.getString(3)}")
  }

  test("as-of join carries whole right rows, not per-column lasts") {
    val left = Seq((1L, 10L, 300L)).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L, Some("old"), Some(1.0)),
      (10L, 200L, None: Option[String], Some(2.0)) // matching row has NULL p1
    ).toDF("k", "t", "p1", "p2")
    val r = AsOfJoin.backward(left, right, "k", "t", Seq("p1", "p2")).collect().head
    assert(r.get(3) == null, "NULL field of the matched row must stay NULL")
    assert(r.getDouble(4) == 2.0)
  }

  test("approx aggregates land within tolerance of exact (driver gate can't check q26)") {
    val li = graft.queries.QueryDef.table(spark, "/root/testdata/sf0.01", "lineitem")
    val r = li.agg(
      countDistinct($"l_orderkey").as("exact_d"),
      approx_count_distinct($"l_orderkey").as("approx_d"),
      expr("percentile_approx(l_quantity, 0.5, 10000)").as("approx_p50"),
      expr("percentile(l_quantity, 0.45)").as("p45"),
      expr("percentile(l_quantity, 0.55)").as("p55")
    ).collect().head
    val (exactD, approxD) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"approx_count_distinct $approxD vs exact $exactD drifted >5%")
    val (p50, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(p50 >= lo && p50 <= hi,
      s"approx p50 $p50 outside exact rank band [$lo, $hi]")
  }

  test("as-of joins match a naive reference on randomized inputs (ties, NULLs, gaps)") {
    val rng = new java.util.SplittableRandom(17)
    def maybeNull[T](v: T): Option[T] = if (rng.nextInt(10) == 0) None else Some(v)
    val left = (0 until 300).map(i =>
      (i.toLong, rng.nextLong(8), rng.nextLong(50))).toDF("id", "k", "t")
    val rightRows = (0 until 300).map(i =>
      (maybeNull(rng.nextLong(8)), maybeNull(rng.nextLong(50)), i.toLong))
    val right = rightRows.toDF("k", "t", "payload")

    // naive reference: scan all right rows per left row
    val cleanRight = rightRows.collect { case (Some(k), Some(t), p) => (k, t, p) }
    def expected(back: Boolean): Map[Long, Option[Long]] =
      left.collect().map { r =>
        val (id, k, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val cands = cleanRight.filter(c => c._1 == k && (if (back) c._2 <= t else c._2 >= t))
        val best =
          if (cands.isEmpty) None
          // nearest time wins; ties at equal time -> max payload id is NOT
          // defined by the operator, so only compare the matched TIME
          else Some(if (back) cands.map(_._2).max else cands.map(_._2).min)
        id -> best
      }.toMap

    def gotTimes(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] = {
      // map matched payload back to its right-row time (None when NULL)
      val byPayload = cleanRight.map(c => c._3 -> c._2).toMap
      df.collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None else Some(byPayload(r.getLong(3))))
      }.toMap
    }
    assert(gotTimes(AsOfJoin.backward(left, right, "k", "t", Seq("payload"))) == expected(back = true))
    assert(gotTimes(AsOfJoin.forward(left, right, "k", "t", Seq("payload"))) == expected(back = false))
  }

  test("bucketed tables co-locate the equi-join: zero exchanges") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a previous JVM's managed-table dirs block CREATE (the in-memory
      // catalog of THIS session has never heard of them) — clear both
      // catalog entries and leftover locations
      for (t <- Seq("graft_bucketed_a", "graft_bucketed_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val dir = new java.io.File(s"spark-warehouse/$t")
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          rm(dir)
        }
      }
      val trx = graft.datagen.DataGen
        .transactions(spark, graft.datagen.DataGen.Config(100L, 2, 5))
      trx.write.mode("overwrite")
        .bucketBy(8, "customer_id").sortBy("customer_id")
        .saveAsTable("graft_bucketed_a")
      trx.groupBy("customer_id").agg(count(lit(1)).as("n")).write.mode("overwrite")
        .bucketBy(8, "customer_id")
        .saveAsTable("graft_bucketed_b")
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "customer_id")
      val exchanges = joined.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join should shuffle nothing, found ${exchanges.length}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("range-partitioned sorted layout yields disjoint per-file ranges (scan-pruning layout)") {
    // The data-layout prerequisite for parquet min/max row-group pruning
    // at scale: repartitionByRange + sortWithinPartitions gives each
    // output file a disjoint key range, so a point/range filter touches
    // one file's row groups instead of all of them.
    val out = "target/test_range_layout"
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartitionByRange(4, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2, "need multiple files to prove disjointness")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(unix_micros(to_utc_timestamp(col("l_shipdate"), "UTC"))),
          max(unix_micros(to_utc_timestamp(col("l_shipdate"), "UTC")))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"file ranges overlap: $hi > $lo")
    }
  }
}
