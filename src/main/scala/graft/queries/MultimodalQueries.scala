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

  /** Engine-side asset table: documents' text bytes as binary payloads. */
  private def assets(s: org.apache.spark.sql.SparkSession, dir: String) =
    QueryDef.table(s, dir, "documents").select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** Oracle-side decoded CTE (mirror of Multimodal.fakeMeta). */
  private val decodedCte =
    s"""a AS (SELECT doc_id AS asset_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |  text FROM documents),
       |d AS (SELECT asset_id, kind,
       |  octet_length(encode(text)) AS n_bytes,
       |  160 + (${hexLong(1)} % 1760) AS width,
       |  120 + (${hexLong(9)} % 960) AS height,
       |  CASE WHEN kind = 'video' THEN 1 + (${hexLong(17)} % 240) ELSE 1 END AS n_frames
       | FROM a)""".stripMargin

  /** DuckDB: byte `i` (0-based) of sha-256(text) as 0..255. */
  private def hexByte(i: Int): String = {
    def nib(p: Int) =
      s"CAST(strpos('0123456789abcdef', substring(sha256(text), $p, 1)) - 1 AS BIGINT)"
    s"(${nib(2 * i + 1)} * 16 + ${nib(2 * i + 2)})"
  }

  val defs: Seq[QueryDef] = Seq(

    // REAL image decode: deterministic fixture PNGs (dims derived from
    // the asset index by a fixed formula) flow through the batched
    // decode stage; javax.imageio must recover the genuine width/height,
    // and the oracle recomputes the expected dims from the same formula
    // — if decode ever regressed to the stub, every row would mismatch.
    QueryDef("mm_decode_png",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val n = 48
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until n).map { i =>
          val w = 8 + (i * 7) % 40
          val h = 8 + (i * 11) % 40
          org.apache.spark.sql.Row(i.toLong, "image", Multimodal.pngBytes(w, h, i))
        }.asJava
        Multimodal.decode(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), col("width"), col("height"), col("n_frames"))
      },
      Some("""SELECT CAST(i AS BIGINT) AS asset_id,
             | CAST(8 + (i * 7) % 40 AS INT) AS width,
             | CAST(8 + (i * 11) % 40 AS INT) AS height,
             | CAST(1 AS INT) AS n_frames
             |FROM range(0, 48) t(i)""".stripMargin)),

    // REAL pixel work: perceptual average-hash over decoded 8x8 fixture
    // PNGs — pngBytes' pixel formula is replayed by the oracle through
    // the same integer luma/threshold/bit-pack arithmetic, so the gate
    // hash-checks genuine decoded PIXELS (dims alone can't produce the
    // right 64 bits).
    QueryDef("mm_ahash",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until 48).map { i =>
          org.apache.spark.sql.Row(i.toLong, "image", Multimodal.pngBytes(8, 8, i))
        }.asJava
        Multimodal.aHash(s.createDataFrame(rows, Multimodal.assetSchema))
      },
      Some("""WITH px AS (
             |  SELECT i.range AS i, k.range AS k,
             |    (((k.range % 8) * 31 + (k.range // 8) * 17 + i.range * 7919) & 16777215) AS rgb
             |  FROM range(0, 48) i, range(0, 64) k),
             |l AS (SELECT i, k,
             |   (77 * ((rgb >> 16) & 255) + 150 * ((rgb >> 8) & 255) + 29 * (rgb & 255)) >> 8 AS luma
             |  FROM px),
             |s AS (SELECT i, sum(luma) AS total FROM l GROUP BY 1),
             |b AS (SELECT l.i, l.k,
             |   CASE WHEN 64 * l.luma >= s.total THEN 1 ELSE 0 END AS bit
             |  FROM l JOIN s USING (i)),
             |h AS (SELECT i,
             |   CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << (31 - k)) ELSE 0 END) AS BIGINT) AS hi,
             |   CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (63 - k)) ELSE 0 END) AS BIGINT) AS lo
             |  FROM b GROUP BY 1)
             |SELECT CAST(i AS BIGINT) AS asset_id, printf('%08x%08x', hi, lo) AS ahash_hex
             |FROM h""".stripMargin)),

    // END-TO-END image near-dup: grayscale fixture PNGs in 24 pattern
    // families x 2 (original + brightness-shifted twin with different
    // BYTES), decoded and aHashed for real, then Hamming-banded into
    // pairs by the generic 64-bit fingerprint machinery. The oracle
    // replays pixels -> hash halves -> 16-bit bands -> mega-bucket
    // guard -> exact xor/bit_count rescoring, so decode, hashing AND
    // the candidate join are all hash-checked together.
    QueryDef("mm_ahash_neardup",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until 48).map { i =>
          org.apache.spark.sql.Row(i.toLong, "image",
            Multimodal.grayPngBytes(8, 8, seed = i % 24, shift = if (i < 24) 0 else 8))
        }.asJava
        val hashed = Multimodal.aHash(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), Multimodal.aHashLong(col("ahash_hex")).as("ahash"))
        graft.llm.Dedup.hammingPairs64(hashed, "asset_id", "ahash")
      },
      Some("""WITH px AS (
             |  SELECT i.range AS i, k.range AS k,
             |    10 + (((k.range % 8) * 13 + (k.range // 8) * 29 + (i.range % 24) * 31) % 200)
             |      + (CASE WHEN i.range < 24 THEN 0 ELSE 8 END) AS luma
             |  FROM range(0, 48) i, range(0, 64) k),
             |s AS (SELECT i, sum(luma) AS total FROM px GROUP BY 1),
             |b AS (SELECT px.i, px.k,
             |   CASE WHEN 64 * px.luma >= s.total THEN 1 ELSE 0 END AS bit
             |  FROM px JOIN s USING (i)),
             |h AS (SELECT i,
             |   CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << (31 - k)) ELSE 0 END) AS BIGINT) AS hi,
             |   CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (63 - k)) ELSE 0 END) AS BIGINT) AS lo
             |  FROM b GROUP BY 1),
             |bands AS (SELECT i, hi, lo, unnest([
             |   'q0:' || CAST(lo & 65535 AS VARCHAR),
             |   'q1:' || CAST((lo >> 16) & 65535 AS VARCHAR),
             |   'q2:' || CAST(hi & 65535 AS VARCHAR),
             |   'q3:' || CAST((hi >> 16) & 65535 AS VARCHAR)]) AS band FROM h),
             |d AS (SELECT * FROM bands WHERE band IN
             |  (SELECT band FROM bands GROUP BY band HAVING count(*) <= 64)),
             |p AS (SELECT DISTINCT a.i AS id_a, b.i AS id_b,
             |   bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
             |  FROM d a JOIN d b ON a.band = b.band AND a.i < b.i)
             |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             | CAST(hamming AS INT) AS hamming FROM p WHERE hamming <= 3""".stripMargin)),

    // End-to-end AUDIO near-dup: 24 sample-formula families ×
    // (original + EXACT half-amplitude twin with different bytes) flow
    // through real javax.sound PCM decode -> block-energy hash ->
    // banded Hamming pairs. The energy hash is amplitude-scale
    // invariant (bits relative to the stream's own mean), so each twin
    // pair lands at Hamming 0; the oracle replays samples -> |v| block
    // sums -> cross-multiplied bits -> quarter bands -> guard ->
    // rescore, all in integer SQL — sample-level decode is
    // hash-checked, not just frame counts.
    QueryDef("mm_audio_neardup",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until 48).map { i =>
          org.apache.spark.sql.Row(i.toLong, "audio",
            Multimodal.evenWavBytes(640, 8000, seed = i % 24,
              shift = if (i < 24) 0 else 1))
        }.asJava
        val hashed = Multimodal.audioHash(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), Multimodal.aHashLong(col("ahash_hex")).as("ahash"))
        graft.llm.Dedup.hammingPairs64(hashed, "asset_id", "ahash")
      },
      Some("""WITH sm AS (
             |  SELECT i.range AS i, k.range AS k,
             |    ((2 * (((k.range * 131 + (i.range % 24) * 7919) % 32768) - 16384))
             |      >> (CASE WHEN i.range < 24 THEN 0 ELSE 1 END)) AS v
             |  FROM range(0, 48) i, range(0, 640) k),
             |cs AS (SELECT i, (k * 64) // 640 AS cell, sum(abs(v)) AS cellsum,
             |   count(*) AS cellcnt FROM sm GROUP BY 1, 2),
             |tt AS (SELECT i, sum(cellsum) AS total FROM cs GROUP BY 1),
             |b AS (SELECT cs.i, cs.cell,
             |   CASE WHEN cs.cellsum * 640 >= tt.total * cs.cellcnt THEN 1 ELSE 0 END AS bit
             |  FROM cs JOIN tt USING (i)),
             |h AS (SELECT i,
             |   CAST(sum(CASE WHEN cell < 32 THEN bit * (1::BIGINT << (31 - cell)) ELSE 0 END) AS BIGINT) AS hi,
             |   CAST(sum(CASE WHEN cell >= 32 THEN bit * (1::BIGINT << (63 - cell)) ELSE 0 END) AS BIGINT) AS lo
             |  FROM b GROUP BY 1),
             |bands AS (SELECT i, hi, lo, unnest([
             |   'q0:' || CAST(lo & 65535 AS VARCHAR),
             |   'q1:' || CAST((lo >> 16) & 65535 AS VARCHAR),
             |   'q2:' || CAST(hi & 65535 AS VARCHAR),
             |   'q3:' || CAST((hi >> 16) & 65535 AS VARCHAR)]) AS band FROM h),
             |d AS (SELECT * FROM bands WHERE band IN
             |  (SELECT band FROM bands GROUP BY band HAVING count(*) <= 64)),
             |p AS (SELECT DISTINCT a.i AS id_a, b.i AS id_b,
             |   bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
             |  FROM d a JOIN d b ON a.band = b.band AND a.i < b.i)
             |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             | CAST(hamming AS INT) AS hamming FROM p WHERE hamming <= 3""".stripMargin)),

    // REAL audio decode: deterministic fixture WAVs (frame counts from
    // a fixed formula, 8 kHz PCM) flow through the same batched decode
    // stage; javax.sound.sampled must recover the genuine frame count
    // and duration, and the oracle recomputes both from the formula —
    // a regression to the stub mismatches every row.
    QueryDef("mm_decode_wav",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val n = 48
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until n).map { i =>
          val samples = 800 + (i * 37) % 1600
          org.apache.spark.sql.Row(i.toLong, "audio", Multimodal.wavBytes(samples, 8000, i))
        }.asJava
        Multimodal.decode(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), col("n_frames"),
            round(col("duration_s") + lit(1e-6), 6).as("duration_s"))
      },
      Some("""SELECT CAST(i AS BIGINT) AS asset_id,
             | CAST(800 + (i * 37) % 1600 AS INT) AS n_frames,
             | round((800 + (i * 37) % 1600) / 8000.0 + 0.000001, 6) AS duration_s
             |FROM range(0, 48) t(i)""".stripMargin)),

    // REAL compressed-audio container decode (MP3): deterministic
    // fixture MP3s (frame counts from a fixed formula; 96 kbit/s /
    // 32 kHz MPEG-1 Layer III headers) flow through the batched decode
    // stage; the frame-header walker must recover the genuine sample
    // count (1152 PCM samples per frame) and duration, and the oracle
    // recomputes both from the formula — a regression to the
    // sha-derived stub mismatches every row.
    QueryDef("mm_decode_mp3",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val n = 48
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until n).map { i =>
          val frames = 5 + (i * 17) % 90
          org.apache.spark.sql.Row(i.toLong, "audio", Multimodal.mp3Bytes(frames, i))
        }.asJava
        Multimodal.decode(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), col("n_frames"),
            round(col("duration_s") + lit(1e-6), 6).as("duration_s"))
      },
      Some("""SELECT CAST(i AS BIGINT) AS asset_id,
             | CAST((5 + (i * 17) % 90) * 1152 AS INT) AS n_frames,
             | round((5 + (i * 17) % 90) * 1152 / 32000.0 + 0.000001, 6) AS duration_s
             |FROM range(0, 48) t(i)""".stripMargin)),

    // REAL compressed-audio container decode (FLAC): deterministic
    // fixture FLAC streams (total-sample counts from a fixed formula,
    // 16 kHz STREAMINFO) flow through the batched decode stage; the
    // STREAMINFO reader must recover the genuine totals, and the
    // oracle recomputes them from the formula.
    QueryDef("mm_decode_flac",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val n = 48
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until n).map { i =>
          val samples = 4000L + (i * 211) % 8000
          org.apache.spark.sql.Row(i.toLong, "audio", Multimodal.flacBytes(samples, 16000, i))
        }.asJava
        Multimodal.decode(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), col("n_frames"),
            round(col("duration_s") + lit(1e-6), 6).as("duration_s"))
      },
      Some("""SELECT CAST(i AS BIGINT) AS asset_id,
             | CAST(4000 + (i * 211) % 8000 AS INT) AS n_frames,
             | round((4000 + (i * 211) % 8000) / 16000.0 + 0.000001, 6) AS duration_s
             |FROM range(0, 48) t(i)""".stripMargin)),

    // REAL video container decode: deterministic fixture MP4s (dims,
    // frame counts and durations from fixed formulas) flow through the
    // batched decode stage; the ISO-BMFF box walker must recover the
    // genuine moov/tkhd/stsz fields, and the oracle recomputes them
    // from the formulas — a regression to the sha-derived stub
    // mismatches every row.
    QueryDef("mm_decode_mp4",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        val n = 48
        val rows: java.util.List[org.apache.spark.sql.Row] = (0 until n).map { i =>
          val w = 16 + (i * 5) % 64
          val h = 16 + (i * 9) % 48
          val frames = 10 + (i * 13) % 120
          org.apache.spark.sql.Row(i.toLong, "video",
            Multimodal.mp4Bytes(w, h, frames, 600, frames * 25, i))
        }.asJava
        Multimodal.decode(s.createDataFrame(rows, Multimodal.assetSchema))
          .select(col("asset_id"), col("width"), col("height"), col("n_frames"),
            round(col("duration_s") + lit(1e-6), 6).as("duration_s"))
      },
      Some("""SELECT CAST(i AS BIGINT) AS asset_id,
             | CAST(16 + (i * 5) % 64 AS INT) AS width,
             | CAST(16 + (i * 9) % 48 AS INT) AS height,
             | CAST(10 + (i * 13) % 120 AS INT) AS n_frames,
             | round((10 + (i * 13) % 120) * 25.0 / 600.0 + 0.000001, 6) AS duration_s
             |FROM range(0, 48) t(i)""".stripMargin)),

    // Frame sampling: every 24th frame index per video asset — the
    // explode-shaped pre-processing stage of a frame-level pipeline.
    QueryDef("mm_frames",
      (s, dir) => Multimodal.sampleFrames(Multimodal.decode(assets(s, dir)))
        .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx")),
      Some(s"""WITH $decodedCte
              |SELECT asset_id, CAST(unnest(range(0, n_frames, 24)) AS BIGINT) AS frame_idx
              |FROM d WHERE kind = 'video'""".stripMargin)),

    // Resize planning: aspect-preserving fit into a 512 box (pure column
    // arithmetic; the pixel kernel is the documented stub boundary).
    QueryDef("mm_resize",
      (s, dir) => Multimodal.resize(Multimodal.decode(assets(s, dir)))
        .select(col("asset_id"), col("kind"), col("width"), col("height"),
          col("out_width"), col("out_height")),
      Some(s"""WITH $decodedCte,
              |r AS (SELECT asset_id, kind, width, height,
              |  least(512.0 / width, 512.0 / height, 1.0) AS scale FROM d)
              |SELECT asset_id, kind, CAST(width AS INT) AS width,
              | CAST(height AS INT) AS height,
              | CAST(floor(width * scale) AS INT) AS out_width,
              | CAST(floor(height * scale) AS INT) AS out_height
              |FROM r""".stripMargin)),

    // Fake-embedding stage: per-asset squared norm of the digest-derived
    // vector — (byte-128)/128 values are dyadic, so the double sums are
    // bit-identical across engines and the scalar hash-compares exactly.
    QueryDef("mm_embed",
      (s, dir) => {
        val emb = Multimodal.fakeEmbedding(assets(s, dir))
        emb.select(col("asset_id"),
          round(graft.llm.Embeddings.dot(col("embedding"), col("embedding"))
            + lit(1e-6), 4).as("norm2"))
      },
      Some {
        val terms = (0 until 16)
          .map(i => s"pow((${hexByte(i)} - 128) / 128.0, 2)").mkString(" + ")
        s"""WITH a AS (SELECT doc_id AS asset_id, text FROM documents)
           |SELECT asset_id, round(($terms) + 0.000001, 4) AS norm2
           |FROM a""".stripMargin
      }),

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
