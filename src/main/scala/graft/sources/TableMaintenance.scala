package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Maintenance for the persisted index tables ([[graft.llm.Dedup.writeBandedIndex]],
  * [[graft.llm.Embeddings.writeIvfIndex]]) — and any other bucketed
  * catalog table.
  *
  * Why this exists: Spark's bucketed APPEND does not shuffle — every
  * write task emits its own file into each bucket it touches, so a
  * daily `insertInto` ingest grows the table by O(tasks × buckets)
  * files per day. At corpus scale that is the classic small-files
  * spiral: scan task churn, NameNode/listing pressure, and ever-more
  * files per bucketed-join partition. Compaction is the standing
  * maintenance op every production table layout schedules.
  */
object TableMaintenance {

  private def tableMeta(spark: SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))

  /** Number of DATA files backing `table`'s location (recursive;
    * `_SUCCESS`/hidden files excluded) — the quantity compaction
    * exists to shrink, exposed so gates and monitoring can assert on
    * it instead of trusting the rewrite happened.
    */
  def dataFileCount(spark: SparkSession, table: String): Long = {
    val loc = new Path(tableMeta(spark, table).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(loc, true)
    var n = 0L
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Rewrite a bucketed table into a fresh generation directory with
    * ONE file per bucket, preserving the bucket spec (count, columns,
    * sort columns) so every exchange-free join/aggregate property the
    * layout bought survives compaction unchanged.
    *
    * How: the input is repartitioned on the WRITER'S OWN bucket-id
    * expression — `pmod(hash(bucketCols), numBuckets)`, the same
    * murmur3-mod the bucketed writer stamps into file names — so every
    * row of a bucket lands in one task and the writer emits exactly
    * one file per non-empty bucket. One full-table exchange, the floor
    * for a rewrite that must merge files within each bucket. Why not
    * `repartition(n, bucketCols)` directly: Spark's write planner
    * ELIMINATES a repartition on the bucket columns under a bucketed
    * write (the writer re-derives placement per-row, so any incoming
    * distribution is "redundant" for correctness — but its removal
    * restores one-file-per-(task, bucket) sprawl); a repartition on
    * the derived bucket-id expression is opaque to that rule and
    * survives. (String bucket columns: `functions.hash` matches the
    * writer's collation-aware hash under the default binary collation;
    * either way, rows with EQUAL column values always co-locate, which
    * is what one-file-per-bucket needs.)
    * The swap is generation-based, never in-place: the compacted copy
    * lands at `newPath` under a staging name, then a DROP + RENAME
    * re-points the catalog. Reading the live table while writing the
    * staging one is safe because the paths differ — the in-place
    * alternative is Spark's "cannot overwrite a path being read"
    * error, or torn files on failure. Crash-safety: die before the
    * DROP and the live table is untouched; die between DROP and RENAME
    * and the data survives at BOTH paths (re-run the RENAME).
    *
    * Returns the superseded generation's location; deleting it (after
    * in-flight readers drain) is the caller's retention decision.
    */
  def compactBucketedTable(
      spark: SparkSession, table: String, newPath: String): String = {
    val meta = tableMeta(spark, table)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table has no bucket spec — this compactor is bucket-preserving by design"))
    val oldLoc = new Path(meta.location)
    val fs = oldLoc.getFileSystem(spark.sessionState.newHadoopConf())
    val dst = fs.makeQualified(new Path(newPath))
    require(dst != fs.makeQualified(oldLoc),
      s"new generation path must differ from the live one: $dst")
    val bucketCols = spec.bucketColumnNames
    val bucketId = pmod(hash(bucketCols.map(col): _*), lit(spec.numBuckets))
    val writer0 = spark.table(table)
      .repartition(spec.numBuckets, bucketId)
      .write.mode("overwrite").format("parquet")
      .bucketBy(spec.numBuckets, bucketCols.head, bucketCols.tail: _*)
      .option("path", dst.toString)
    val writer = spec.sortColumnNames match {
      case Nil  => writer0
      case sort => writer0.sortBy(sort.head, sort.tail: _*)
    }
    val stage = s"${table}__compact"
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    writer.saveAsTable(stage)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $stage RENAME TO $table")
    oldLoc.toString
  }
}
