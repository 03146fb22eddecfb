package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: payloads are opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches. The Spark-side plumbing — schema, binary columns, the batched
  * `mapPartitions` decode boundary (the JVM twin of `mapInPandas`:
  * one iterator per partition, rows streamed through, output schema
  * declared up front), partitioning — is real and oracle-checked.
  *
  * ==DECODE IS A STUB==
  * This container has no image/audio codecs, so [[decode]] derives
  * DETERMINISTIC FAKE metadata from the sha-256 of the payload instead of
  * parsing media headers. A production deployment swaps `fakeMeta` for a
  * real decoder (javacv / TwelveMonkeys / ffmpeg-over-pipe) without
  * touching any of the surrounding plumbing; the fake is pure arithmetic
  * on the digest precisely so the DuckDB oracle can replay it.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false)))

  /** Deterministic fake decode of one payload (see class doc). */
  private[multimodal] def fakeMeta(kind: String, payload: Array[Byte]): (Int, Int, Int, Double) = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    def h(from: Int): Long = java.lang.Long.parseLong(hex.substring(from, from + 8), 16)
    val width = 160 + (h(0) % 1760L).toInt
    val height = 120 + (h(8) % 960L).toInt
    val frames = if (kind == "video") 1 + (h(16) % 240L).toInt else 1
    val duration = frames / 24.0
    (width, height, frames, duration)
  }

  /** Batched decode: one task per partition streams its rows through the
    * (stubbed) decoder — the exact execution shape a Pandas-UDF
    * `mapInPandas` decode stage has, minus the Arrow/IPC hop.
    */
  def decode(assets: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(decodedSchema)
    assets
      .select(col("asset_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val (w, h, f, d) = fakeMeta(r.getString(1), payload)
          Row(r.getLong(0), r.getString(1), payload.length.toLong, w, h, f, d)
        }
      }.toDF()
  }

  /** Deterministic fake feature vector from the payload digest — the
    * shape (fixed-dim `array<float>`) a real embedding model would emit.
    */
  def fakeEmbedding(assets: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    implicit val enc = Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val digest = md.digest(r.getAs[Array[Byte]](1))
        val vec = (0 until dim).map { i =>
          ((digest(i % digest.length) & 0xff) - 128) / 128.0f
        }.toArray
        Row(r.getLong(0), vec)
      }
    }.toDF()
  }

  /** Frame sampling for video assets: one row per sampled frame index
    * (every `step`-th frame) — the explode-shaped pre-processing stage of
    * a frame-level vision pipeline.
    */
  def sampleFrames(decoded: DataFrame, step: Int = 24): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  /** Resize stage (STUB like decode: target geometry is computed, pixel
    * resampling is where a real library would run). Aspect-preserving
    * fit into a `maxSide` box; pure column arithmetic, codegen'd, and
    * exactly the transform a real resize would parameterize.
    */
  def resize(decoded: DataFrame, maxSide: Int = 512): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    decoded.select(col("asset_id"), col("kind"),
      col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"))
  }
}
