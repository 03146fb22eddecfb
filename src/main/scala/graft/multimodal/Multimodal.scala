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
  * frame count → duration; `mm_decode_wav` gate). VIDEO CONTAINER
  * metadata is decoded for real as well: [[videoMeta]] walks MP4 /
  * ISO-BMFF box headers (`moov`→`mvhd` for duration, `trak`→`tkhd` for
  * width×height, `stbl`→`stsz` for the sample count) — pure JVM byte
  * parsing, no codec needed (`mm_decode_mp4` gate). Remaining
  * documented stubs:
  *   - video PIXELS and compressed audio SAMPLES (this container has
  *     no media codecs) — container metadata is real, decoded frames
  *     are not; a production deployment swaps in javacv /
  *     ffmpeg-over-pipe without touching the surrounding plumbing;
  *   - a payload the parsers can't read (e.g. the text-byte stand-in
  *     payloads of the aggregate gates, or a fragmented MP4 whose
  *     sample count genuinely isn't in `moov`) falls back to
  *     [[fakeMeta]] — deterministic sha-256-derived fields the DuckDB
  *     oracle can replay, keeping malformed inputs non-fatal.
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

  // ---- MP4 / ISO-BMFF container parsing (pure byte walking, no codec) ----

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  /** Walk the ISO-BMFF box sequence in `[start, end)`, calling `f(type,
    * payloadStart, payloadEnd)` per box. Handles 32-bit sizes, the
    * 64-bit `size==1` largesize escape, and the `size==0` to-end form;
    * stops (without throwing) at the first malformed header.
    */
  private def foreachBox(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = be32(b, off)
      val typ = new String(b, off + 4, 4, "ISO-8859-1")
      val hdr = if (size32 == 1) 16 else 8
      val size: Long =
        if (size32 == 1) { if (off + 16 > end) return; be64(b, off + 8) }
        else if (size32 == 0) (end - off).toLong
        else size32
      if (size < hdr || off + size > end) return
      f(typ, off + hdr, (off + size).toInt)
      off += size.toInt
    }
  }

  /** Real MP4/ISO-BMFF container metadata — (width, height, n_frames,
    * duration_s) from box HEADERS alone: `moov`→`mvhd` carries
    * timescale+duration (v0 and v1 layouts), the first `trak` with a
    * nonzero `tkhd` 16.16 width×height is the video track, and its
    * `stbl`→`stsz` sample count is the frame count. None when any of
    * those is absent (not an MP4, or a fragmented MP4 whose sample
    * count lives in `moof` fragments) — the caller falls back to the
    * documented stub rather than fabricating fields.
    */
  private[multimodal] def videoMeta(payload: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    var duration: Option[Double] = None
    var dims: Option[(Int, Int)] = None
    var frames: Option[Int] = None
    try {
      foreachBox(payload, 0, payload.length) {
        case ("moov", ms, me) =>
          foreachBox(payload, ms, me) {
            case ("mvhd", s, e) =>
              val ver = payload(s) & 0xff
              if (ver == 1 && e - s >= 32) {
                val ts = be32(payload, s + 20)
                if (ts > 0) duration = Some(be64(payload, s + 24).toDouble / ts)
              } else if (ver == 0 && e - s >= 20) {
                val ts = be32(payload, s + 12)
                if (ts > 0) duration = Some(be32(payload, s + 16).toDouble / ts)
              }
            case ("trak", ts0, te) =>
              var w = 0; var h = 0; var fr = -1
              foreachBox(payload, ts0, te) {
                case ("tkhd", s, e) =>
                  val base = s + (if ((payload(s) & 0xff) == 1) 88 else 76)
                  if (base + 8 <= e) {
                    w = (be32(payload, base) >> 16).toInt
                    h = (be32(payload, base + 4) >> 16).toInt
                  }
                case ("mdia", s, e) => foreachBox(payload, s, e) {
                  case ("minf", s2, e2) => foreachBox(payload, s2, e2) {
                    case ("stbl", s3, e3) => foreachBox(payload, s3, e3) {
                      case ("stsz", zs, ze) if ze - zs >= 12 =>
                        fr = be32(payload, zs + 8).toInt
                      case _ =>
                    }
                    case _ =>
                  }
                  case _ =>
                }
                case _ =>
              }
              if (w > 0 && h > 0 && dims.isEmpty) {
                dims = Some((w, h))
                if (fr >= 0) frames = Some(fr)
              }
            case _ =>
          }
        case _ =>
      }
    } catch { case _: ArrayIndexOutOfBoundsException => return None }
    for { (w, h) <- dims; d <- duration; f <- frames } yield (w, h, f, d)
  }

  /** Deterministic in-memory MP4 (spec-layout `ftyp`+`moov`+`mdat`
    * boxes, constant-size samples so `stsz` needs no table) — fixture
    * support for the real video-decode gate: every field is a fixed
    * function of the arguments, so the same call always produces
    * byte-identical fixtures. Duration is `durationUnits / timescale`
    * seconds.
    */
  def mp4Bytes(w: Int, h: Int, nFrames: Int,
      timescale: Int, durationUnits: Int, seed: Int): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val p = payload.flatten.toArray
      cat(u32(p.length + 8L), typ.getBytes("ISO-8859-1"), p)
    }
    val matrix = cat(u32(0x10000), u32(0), u32(0), u32(0), u32(0x10000),
      u32(0), u32(0), u32(0), u32(0x40000000))
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1"), u32(0x200),
      "isom".getBytes("ISO-8859-1"), "mp41".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd", u32(0), u32(0), u32(0),
      u32(timescale), u32(durationUnits),
      u32(0x10000), Array[Byte](1, 0), new Array[Byte](10),
      matrix, new Array[Byte](24), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0),
      u32(durationUnits), new Array[Byte](8), new Array[Byte](8),
      matrix, u32(w.toLong << 16), u32(h.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0),
      u32(timescale), u32(durationUnits), Array[Byte](0x55, (0xc4 - 256).toByte), new Array[Byte](2))
    val hdlr = box("hdlr", u32(0), u32(0),
      "vide".getBytes("ISO-8859-1"), new Array[Byte](12), Array[Byte](0))
    val stsz = box("stsz", u32(0), u32(256), u32(nFrames))
    val minf = box("minf", box("stbl", stsz))
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    val mdat = box("mdat",
      Array.tabulate(64 + math.abs(seed) % 128)(i => ((i * 31 + seed) & 0xff).toByte))
    cat(ftyp, box("moov", mvhd, trak), mdat)
  }

  /** Batched decode: one task per partition streams its rows through the
    * decoder — the exact execution shape a Pandas-UDF `mapInPandas`
    * decode stage has, minus the Arrow/IPC hop. Images ([[imageMeta]]),
    * PCM audio ([[audioMeta]]: width/height 0, n_frames = audio
    * frames, duration = frames/rate) and MP4 video containers
    * ([[videoMeta]]) decode for real; unparsable payloads take the
    * documented [[fakeMeta]] stub.
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
            case "video" => videoMeta(payload)
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
    decoded.filter(col("kind") === "video" && col("n_frames") >= 1)
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
