package graft.datagen

import graft.GraftSession

/** Data-generation CLI — the user-facing entry point the reference ships
  * as `python -m data_generation` (reference
  * python/data_generation/__init__.py:24-119: size presets, seed, output
  * prefix), so a dataset can be produced without writing Scala:
  *
  * {{{
  * sbt "runMain graft.datagen.Main tiny --out /tmp/graft_tiny"
  * sbt "runMain graft.datagen.Main custom --customers 500 --partitions 4 \
  *        --days 30 --seed 7 --out /tmp/mine"
  * }}}
  *
  * Presets mirror the reference sizes (tiny|small|medium|big|verify);
  * `--seed` changes every draw deterministically; `--cpus` overrides the
  * local parallelism (default: SPARK_GRAFT_CPUS or 8).
  */
object Main {

  private val presets: Map[String, DataGen.Config] = Map(
    "tiny" -> DataGen.Tiny,
    "small" -> DataGen.Small,
    "medium" -> DataGen.Medium,
    "big" -> DataGen.Big,
    "verify" -> DataGen.VerifySlice)

  private val usage =
    """usage: graft.datagen.Main <tiny|small|medium|big|verify|custom> --out DIR
      |         [--seed N] [--cpus N]
      |         [--customers N --partitions N --days N]   (custom only)""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val opts = args.drop(1).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

    val base = args(0) match {
      case "custom" =>
        DataGen.Config(
          nCustomers = opts("customers").toLong,
          nPartitions = opts("partitions").toInt,
          daysInPartition = opts("days").toInt)
      case name =>
        presets.getOrElse(name, { System.err.println(usage); sys.exit(2) })
    }
    val cfg = base.copy(seed = opts.get("seed").map(_.toLong).getOrElse(base.seed))
    val out = opts.getOrElse("out", { System.err.println(usage); sys.exit(2) })
    val cpus = opts.get("cpus").map(_.toInt).getOrElse(GraftSession.cpus)

    val spark = GraftSession.build(cpus, "graft-datagen")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    DataGen.write(spark, cfg, out)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"wrote ${args(0)} (customers=${cfg.nCustomers}, partitions=" +
      f"${cfg.nPartitions}, days/partition=${cfg.daysInPartition}, seed=" +
      f"${cfg.seed}) to $out in $secs%.1f s")
    spark.stop()
  }
}
