package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal pipeline gate: documents' text bytes stand in for media
  * payloads (binary column), flow through the batched mapPartitions
  * decode stage, and the stub's digest arithmetic is replayed by the
  * DuckDB oracle — so schema, binary plumbing and batch shape are all
  * hash-checked even though the decoder itself is a documented fake.
  */
object MultimodalQueries {

  /** DuckDB: big-endian fold of 8 hex digits of sha-256 starting at
    * 1-based `start` (mirror of Multimodal.fakeMeta's `h`).
    */
  private def hexLong(start: Int): String =
    s"list_reduce(list_transform(range($start, ${start + 8}), " +
      "i -> CAST(strpos('0123456789abcdef', substring(sha256(text), i, 1)) - 1 AS BIGINT)), " +
      "(a, b) -> a*16 + b)"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_decode_stats",
      (s, dir) => {
        val docs = QueryDef.table(s, dir, "documents")
        val assets = docs.select(
          col("doc_id").as("asset_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          col("text").cast("binary").as("payload"))
        Multimodal.decode(assets)
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_assets"),
            sum(col("n_bytes")).as("sum_bytes"),
            round(avg(col("width")) + lit(1e-6), 4).as("avg_width"),
            round(avg(col("height")) + lit(1e-6), 4).as("avg_height"),
            sum(col("n_frames")).cast("long").as("sum_frames"),
            round(sum(col("duration_s")) + lit(1e-6), 4).as("sum_duration"))
      },
      Some(s"""WITH a AS (SELECT doc_id AS asset_id,
              |  CASE WHEN doc_id % 3 = 0 THEN 'image'
              |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
              |  text FROM documents),
              |d AS (SELECT asset_id, kind,
              |  octet_length(encode(text)) AS n_bytes,
              |  160 + (${hexLong(1)} % 1760) AS width,
              |  120 + (${hexLong(9)} % 960) AS height,
              |  CASE WHEN kind = 'video' THEN 1 + (${hexLong(17)} % 240) ELSE 1 END AS n_frames,
              |  (CASE WHEN kind = 'video' THEN 1 + (${hexLong(17)} % 240) ELSE 1 END) / 24.0 AS duration_s
              | FROM a)
              |SELECT kind, count(*) AS n_assets,
              | CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
              | round(avg(width) + 0.000001, 4) AS avg_width,
              | round(avg(height) + 0.000001, 4) AS avg_height,
              | CAST(sum(n_frames) AS BIGINT) AS sum_frames,
              | round(sum(duration_s) + 0.000001, 4) AS sum_duration
              |FROM d GROUP BY kind""".stripMargin))
  )
}
