package graft.datagen

import graft.model.Model
import graft.model.Model.Transaction
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/** Distributed, seeded synthetic-transactions generator with the same
  * schema, sizes and distributions as the reference's Rust generator
  * (reference src/lib.rs:66-268, python/data_generation/__init__.py:24-115):
  *
  *   - per-customer expected tx/day `E ~ Binomial(n=100, p=0.25)`
  *   - per customer-day row count `~ Uniform[0.9E, 1.1E]`
  *   - card_type DC w.p. 0.75, channel mobile w.p. 0.25, trx_type uniform
  *     over 13 categories, trx_amnt Uniform[100, 10000)
  *   - `t_minus` = absolute day offset, `part_col` = `partition_{N}`
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

  /** The generated table as a typed Dataset; lazy and fully distributed.
    * One generation unit = one (customer, hive-partition) pair.
    */
  def transactions(spark: SparkSession, cfg: Config): Dataset[Transaction] = {
    import spark.implicits._
    val Config(nCustomers, nPartitions, daysInPartition, seed, _, _) = cfg
    val trxTypes = Model.TrxTypes.toArray
    val amntSpan = Model.AmountMax - Model.AmountMin

    spark.range(0L, nCustomers * nPartitions).mapPartitions { units =>
      units.flatMap { unit =>
        val customer = unit / nPartitions
        val part = (unit % nPartitions).toInt
        val e = expectedRate(cfg, customer)
        val lo = e * 9 / 10
        val hi = e * 11 / 10
        val rng = new java.util.SplittableRandom(
          mix(mix(mix(seed) ^ customer) ^ part.toLong))
        val partName = s"partition_$part"
        (0 until daysInPartition).iterator.flatMap { d =>
          val tMinus = part.toLong * daysInPartition + d
          val n = if (hi <= lo) lo else lo + rng.nextInt(hi - lo + 1)
          Iterator.fill(n) {
            Transaction(
              customer_id = customer,
              card_type = if (rng.nextDouble() < 0.75) "DC" else "CC",
              trx_type = trxTypes(rng.nextInt(trxTypes.length)),
              channel = if (rng.nextDouble() < 0.25) "mobile" else "web",
              trx_amnt = Model.AmountMin + rng.nextDouble() * amntSpan,
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
