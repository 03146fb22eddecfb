package graft.model

import org.apache.spark.sql.types._

/** Single source of truth for the transactions-table data model.
  *
  * The reference duplicates these constants into every implementation
  * (e.g. reference impl/pyspark-case-when.py:11-40); here they live once.
  * Category values and distributions per reference src/lib.rs:17-51.
  */
object Model {

  /** One synthetic bank transaction (reference src/lib.rs:241-249). */
  final case class Transaction(
      customer_id: Long,
      card_type: String,
      trx_type: String,
      channel: String,
      trx_amnt: Double,
      t_minus: Long,
      part_col: String
  )

  val TransactionSchema: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("card_type", StringType, nullable = false),
    StructField("trx_type", StringType, nullable = false),
    StructField("channel", StringType, nullable = false),
    StructField("trx_amnt", DoubleType, nullable = false),
    StructField("t_minus", LongType, nullable = false),
    StructField("part_col", StringType, nullable = false)
  ))

  /** P(DC) = 0.75 (reference src/lib.rs:26-28, 92-96). */
  val CardTypes: Seq[String] = Seq("DC", "CC")

  /** Uniform over 13 categories (reference src/lib.rs:33-47). */
  val TrxTypes: Seq[String] = Seq(
    "food-and-household",
    "home",
    "uncategorized",
    "leisure-and-lifestyle",
    "health-and-beauty",
    "shopping-and-services",
    "children",
    "vacation-and-travel",
    "education",
    "insurance",
    "investments-and-savings",
    "expenses-and-other",
    "cars-and-transportation"
  )

  /** P(mobile) = 0.25 (reference src/lib.rs:49-51, 101-106). */
  val Channels: Seq[String] = Seq("mobile", "web")

  /** trx_amnt ~ Uniform[100, 10000) (reference src/lib.rs:17-19). */
  val AmountMin: Double = 100.0
  val AmountMax: Double = 10000.0

  /** Cumulative look-back windows in days (reference docs/index.md:143-151,
    * impl/pyspark-case-when.py:31-40).
    */
  val Windows: Seq[Int] = Seq(7, 14, 21, 30, 90, 180, 360, 720)
}
