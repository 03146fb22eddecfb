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
  * ==DECODE SCOPE==
  * IMAGE payloads are decoded for REAL: JDK `javax.imageio` parses
  * PNG/JPEG/GIF/BMP headers with zero added dependencies, and the
  * `mm_decode_png` gate hash-checks genuine decoded dimensions against
  * fixture-derived expectations. PCM AUDIO is decoded for real too:
  * JDK `javax.sound.sampled` parses WAV/AIFF/AU headers (sample rate,
  * frame count → duration; `mm_decode_wav` gate). Remaining documented
  * stubs:
  *   - VIDEO and compressed audio (this container has no media
  *     codecs) — [[fakeMeta]] derives deterministic fake fields from
  *     the payload's sha-256 so the DuckDB oracle can replay them; a
  *     production deployment swaps in javacv / ffmpeg-over-pipe
  *     without touching the surrounding plumbing;
  *   - a payload the JDK parsers can't read (e.g. the text-byte
  *     stand-in payloads of the aggregate gates) falls back to the
  *     same fake, keeping malformed inputs non-fatal and
  *     oracle-replayable.
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

  /** Deterministic in-memory PNG (JDK ImageIO encoder; headless-safe) —
    * fixture support for the real-decode gate and specs: pixel content
    * is a fixed function of (x, y, seed), so the same call always
    * produces byte-identical fixtures.
    */
  def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17 + seed * 7919) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image header decode: width × height via JDK ImageIO
    * (PNG/JPEG/GIF/BMP). None when the bytes aren't a parsable image.
    */
  private[multimodal] def imageMeta(payload: Array[Byte]): Option[(Int, Int)] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      .map(img => (img.getWidth, img.getHeight))
    catch { case _: java.io.IOException => None }

  /** Deterministic in-memory 16-bit mono PCM WAV (JDK encoder;
    * headless-safe) — fixture support for the real audio-decode gate:
    * sample values are a fixed function of (index, seed), so the same
    * call always produces byte-identical fixtures.
    */
  def wavBytes(nSamples: Int, sampleRate: Int, seed: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((i * 131 + seed * 7919) % 65536 - 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real audio header decode: (sample rate, frame count) via JDK
    * `javax.sound.sampled` (WAV/AIFF/AU — the uncompressed PCM
    * containers the JDK parses without codecs). None when the bytes
    * aren't parsable audio or the header doesn't carry a frame count.
    */
  private[multimodal] def audioMeta(payload: Array[Byte]): Option[(Int, Long)] =
    try {
      val aff = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
      val rate = aff.getFormat.getSampleRate
      val frames = aff.getFrameLength.toLong
      if (rate > 0 && frames >= 0) Some((rate.toInt, frames)) else None
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batched decode: one task per partition streams its rows through the
    * decoder — the exact execution shape a Pandas-UDF `mapInPandas`
    * decode stage has, minus the Arrow/IPC hop. Images ([[imageMeta]])
    * and PCM audio ([[audioMeta]]: width/height 0, n_frames = audio
    * frames, duration = frames/rate) decode for real; video and
    * unparsable payloads take the documented [[fakeMeta]] stub.
    */
  def decode(assets: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(decodedSchema)
    assets
      .select(col("asset_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val real: Option[(Int, Int, Int, Double)] = kind match {
            case "image" => imageMeta(payload).map { case (iw, ih) => (iw, ih, 1, 1 / 24.0) }
            case "audio" => audioMeta(payload).map { case (rate, fr) =>
              (0, 0, fr.toInt, fr.toDouble / rate) }
            case _ => None
          }
          val (w, h, f, d) = real.getOrElse(fakeMeta(kind, payload))
          Row(r.getLong(0), kind, payload.length.toLong, w, h, f, d)
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
