package graft.datagen

import graft.model.Model
import graft.model.Model.Transaction
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/** Distributed, seeded synthetic-transactions generator with the same
  * schema, sizes and distributions as the reference's Rust generator
  * (reference src/lib.rs:66-268, python/data_generation/__init__.py:24-115):
  *
  *   - per-customer expected tx/day `E ~ Binomial(n=100, p=0.25)`
  *   - per customer-day row count `~ Uniform[0.9E, 1.1E)` — half-open,
  *     integer-floored bounds, exactly the reference's
  *     `Uniform((E*90/100)..(E*110/100))` (src/lib.rs:77-80)
  *   - card_type DC w.p. 0.75, channel mobile w.p. 0.25, trx_type uniform
  *     over 13 categories, trx_amnt Uniform[100, 10000)
  *   - `t_minus` is CONSTANT across a partition: every row carries the
  *     partition's day offset `partition * daysInPartition`. The reference
  *     passes a per-day `local_offset` that is initialized but never
  *     incremented (src/lib.rs:163-176 — `local_offset = offset;` then
  *     `for _i in 0..days_in_batch` reuses it), so published datasets and
  *     timings are for data with `nPartitions` distinct t_minus values.
  *     Replicated here so our generated data is genuinely
  *     reference-shaped; the day loop still runs per day, so row VOLUME
  *     matches too.
  *   - `part_col` = `partition_{N}`
  *
  * One deliberate deviation, for verifiability: trx_amnt is uniform on the
  * 1/1024 grid of [100, 10000) rather than the full double continuum.
  * Dyadic amounts make every per-feature sum exactly representable
  * (max sum < 2^43 x 2^-10 grid = well inside double's 53-bit mantissa),
  * so Spark, DuckDB and imperative JVM code produce bit-identical sums
  * REGARDLESS of summation order — which is what lets the 2,080-column
  * reference workload be hash-compared against the DuckDB oracle without
  * float-tolerance games. Statistically the grid is invisible (step
  * 0.00098 over a 9,900-wide range).
  *
  * Bit-compatibility with ChaCha8 is not required (SURVEY.md §7.2); what is
  * required — and delivered — is determinism: the RNG is counter-based,
  * seeded per `(globalSeed, customerId, partition)`, so output is identical
  * for any Spark partitioning / task retry / executor count. Generation is
  * fully distributed over `customers x partitions` units — no driver-side
  * data path, so it scales to the reference's `big` (1M x 730) and beyond.
  */
object DataGen {

  final case class Config(
      nCustomers: Long,
      nPartitions: Int,
      daysInPartition: Int,
      seed: Long = 42L,
      binomialN: Int = 100,
      binomialP: Double = 0.25
  ) {
    def totalDays: Int = nPartitions * daysInPartition
  }

  /** Reference dataset sizes (python/data_generation/__init__.py:36-67). */
  val Tiny: Config = Config(1000L, 6, 120)
  val Small: Config = Config(10000L, 12, 60)
  val Medium: Config = Config(100000L, 102, 7)
  val Big: Config = Config(1000000L, 730, 1)

  /** Reference-shaped slice (~0.7M rows) sized so the 2,080-column DuckDB
    * oracle in the per-round correctness gate finishes in seconds.
    */
  val VerifySlice: Config = Config(250L, 6, 20)

  /** SplitMix64 finalizer — used to derive independent per-unit seeds. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Expected transactions/day for a customer: Binomial(n, p), seeded by
    * (seed, customer) only — stable across partitions, mirroring the
    * once-per-customer draw in python/data_generation/__init__.py:74-76.
    */
  private def expectedRate(cfg: Config, customer: Long): Int = {
    val rng = new java.util.SplittableRandom(mix(mix(cfg.seed) ^ customer))
    var k = 0
    var i = 0
    while (i < cfg.binomialN) {
      if (rng.nextDouble() < cfg.binomialP) k += 1
      i += 1
    }
    k
  }

  private def unitSeed(seed: Long, customer: Long, part: Int): Long =
    mix(mix(mix(seed) ^ customer) ^ part.toLong)

  /** Per-day row counts for one (customer, partition) unit: `U[0.9E, 1.1E)`
    * with integer-floored bounds, half-open, like the reference's
    * `Uniform((E*90/100)..(E*110/100))` (src/lib.rs:77-80). Drawn from a
    * dedicated RNG stream (separate from attribute draws) so row counts
    * are computable without materializing rows.
    */
  private def dayCounts(cfg: Config, customer: Long, part: Int): Iterator[Int] = {
    val e = expectedRate(cfg, customer)
    val lo = e * 90 / 100
    val hi = e * 110 / 100
    val rng = new java.util.SplittableRandom(mix(unitSeed(cfg.seed, customer, part) ^ 1L))
    Iterator.fill(cfg.daysInPartition)(
      if (hi <= lo) lo else lo + rng.nextInt(hi - lo))
  }

  /** Exact row count `transactions(cfg)` will produce, from the count-RNG
    * stream alone — cheap (no row data), used by tests to pin generated
    * volume against the reference's published dataset sizes
    * (docs/benchmark_results.md:29: tiny = 17,299,455 rows).
    */
  def expectedRowCount(cfg: Config): Long = {
    var total = 0L
    var customer = 0L
    while (customer < cfg.nCustomers) {
      var part = 0
      while (part < cfg.nPartitions) {
        val it = dayCounts(cfg, customer, part)
        while (it.hasNext) total += it.next()
        part += 1
      }
      customer += 1
    }
    total
  }

  /** The generated table as a typed Dataset; lazy and fully distributed.
    * One generation unit = one (customer, hive-partition) pair.
    */
  def transactions(spark: SparkSession, cfg: Config): Dataset[Transaction] = {
    import spark.implicits._
    val Config(nCustomers, nPartitions, daysInPartition, seed, _, _) = cfg
    val trxTypes = Model.TrxTypes.toArray
    val amntSpan = Model.AmountMax - Model.AmountMin

    val amntSteps = (amntSpan * 1024.0).toLong
    spark.range(0L, nCustomers * nPartitions).mapPartitions { units =>
      units.flatMap { unit =>
        val customer = unit / nPartitions
        val part = (unit % nPartitions).toInt
        val cnts = dayCounts(cfg, customer, part)
        val rng = new java.util.SplittableRandom(mix(unitSeed(seed, customer, part) ^ 2L))
        val partName = s"partition_$part"
        // Reference semantics: one U[0.9E, 1.1E) draw per DAY, but every
        // row of the partition shares t_minus = the partition offset.
        val tMinus = part.toLong * daysInPartition
        cnts.flatMap { n =>
          Iterator.fill(n) {
            Transaction(
              customer_id = customer,
              card_type = if (rng.nextDouble() < 0.75) "DC" else "CC",
              trx_type = trxTypes(rng.nextInt(trxTypes.length)),
              channel = if (rng.nextDouble() < 0.25) "mobile" else "web",
              trx_amnt = Model.AmountMin + rng.nextLong(amntSteps) / 1024.0,
              t_minus = tMinus,
              part_col = partName
            )
          }
        }
      }
    }
  }

  /** Hive-partitioned snappy parquet, like the reference's
    * pyarrow.parquet.write_to_dataset(partition_cols=["part_col"])
    * (python/data_generation/__init__.py:110-115).
    */
  def write(spark: SparkSession, cfg: Config, path: String): Unit =
    transactions(spark, cfg)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_col")
      .parquet(path)
}
