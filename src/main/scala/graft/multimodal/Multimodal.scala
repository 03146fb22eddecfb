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
  * fixture-derived expectations. AUDIO metadata is decoded for real too:
  * JDK `javax.sound.sampled` parses WAV/AIFF/AU headers (sample rate,
  * frame count → duration; `mm_decode_wav` gate), [[mp3Meta]] walks
  * MPEG-1 Layer III frame headers (`mm_decode_mp3` gate) and
  * [[flacMeta]] reads the FLAC STREAMINFO block (`mm_decode_flac`
  * gate) — both pure byte parsing, no codec. VIDEO CONTAINER
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

  /** Deterministic in-memory GRAYSCALE PNG: gray(x, y) = 10 +
    * ((x·13 + y·29 + seed·31) % 200) + shift. For gray pixels the
    * BT.601 integer luma equals the gray value exactly
    * ((77+150+29)·g >> 8 = g), so an oracle can replay [[aHash]] from
    * this formula alone; a nonzero `shift` (≤ 46 — no channel clamp)
    * produces a brightness-shifted twin whose aHash is bit-identical
    * (bits are mean-relative) while the payload bytes differ — the
    * near-dup fixture.
    */
  def grayPngBytes(w: Int, h: Int, seed: Int, shift: Int = 0): Array[Byte] = {
    require(shift >= 0 && shift <= 46, s"shift $shift would clamp")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = 10 + ((x * 13 + y * 29 + seed * 31) % 200) + shift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic in-memory WAV with EVEN 16-bit samples:
    * v(i) = (2·((i·131 + seed·7919) mod 32768 − 16384)) >> shift —
    * even base values make the shift=1 twin an EXACT half-amplitude
    * copy (no floor error), so [[audioHash]]'s scale invariance is
    * testable bit-for-bit and the oracle replays the formula in
    * integer SQL.
    */
  def evenWavBytes(nSamples: Int, sampleRate: Int, seed: Int, shift: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((2 * ((i * 131 + seed * 7919) % 32768 - 16384)) >> shift).toShort
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

  /** The [[aHash]] hex string as its signed 64-bit value (two 32-bit
    * halves; the high half's shift wraps into the sign bit, which is
    * exactly the packed representation [[aHashBits]] produced) — the
    * join key for [[graft.llm.Dedup.hammingPairs64]].
    */
  def aHashLong(hex: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftleft(conv(substring(hex, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast("long"))

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

  // ---- MP3 (MPEG audio) frame-header parsing (pure byte walking) ----

  /** MPEG-1 bitrate table for Layer III, kbit/s, indexed 1–14. */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample-rate table, indexed 0–2. */
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Real MP3 metadata — (sample rate, PCM sample count) by walking
    * MPEG-1 Layer III frame headers: each 0xFFE-synced header carries
    * the bitrate/sample-rate indices that determine the frame's byte
    * length (`144·bitrate/rate + padding`), so the whole stream is
    * parsable frame-by-frame with no codec; every frame decodes to
    * 1152 PCM samples. Skips a leading ID3v2 tag (syncsafe length).
    * None when no valid frame sequence is found — the caller falls
    * back to the documented stub rather than fabricating fields.
    */
  private[multimodal] def mp3Meta(payload: Array[Byte]): Option[(Int, Long)] = {
    var off = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + 4-byte syncsafe size of the tag body.
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      off = 10 + size
    }
    var frames = 0L
    var rate = 0
    while (off + 4 <= payload.length) {
      val b0 = payload(off) & 0xff; val b1 = payload(off + 1) & 0xff
      val b2 = payload(off + 2) & 0xff
      // sync (11 bits) + MPEG-1 (version bits 11) + Layer III (bits 01);
      // strict: after an optional ID3v2 tag the payload must be one
      // unbroken frame sequence, or the caller falls back to the stub.
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return None
      val bitrateIdx = (b2 >> 4) & 0xf
      val rateIdx = (b2 >> 2) & 0x3
      if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
      val thisRate = Mp3Rates(rateIdx)
      if (rate != 0 && thisRate != rate) return None
      rate = thisRate
      val padding = (b2 >> 1) & 0x1
      val frameLen = 144 * Mp3Bitrates(bitrateIdx) * 1000 / thisRate + padding
      if (frameLen < 4) return None
      frames += 1
      off += frameLen
    }
    if (frames > 0 && off == payload.length) Some((rate, frames * 1152L)) else None
  }

  /** Deterministic in-memory MP3 (valid MPEG-1 Layer III frame headers
    * at 96 kbit/s / 32 kHz mono, deterministic filler main data) —
    * fixture support for the real compressed-audio decode gate: every
    * byte is a fixed function of the arguments, so the same call always
    * produces byte-identical fixtures. Each frame is 1152 samples, so
    * duration is `nFrames·1152/32000` seconds.
    */
  def mp3Bytes(nFrames: Int, seed: Int): Array[Byte] = {
    val frameLen = 144 * 96000 / 32000 // = 432 bytes, no padding
    val out = new Array[Byte](nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      val base = f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(base + 2) = ((7 << 4) | (2 << 2)).toByte // 96 kbit/s, 32 kHz, no padding
      out(base + 3) = 0xc4.toByte // mono
      var i = 4
      while (i < frameLen) { out(base + i) = ((i * 31 + f * 131 + seed * 7919) & 0xff).toByte; i += 1 }
      f += 1
    }
    out
  }

  // ---- FLAC STREAMINFO parsing (pure byte reading) ----

  /** Real FLAC metadata — (sample rate, total samples) from the
    * mandatory STREAMINFO metadata block that directly follows the
    * `fLaC` magic: sample rate is a 20-bit field at bit offset 144 of
    * the block, total samples the 36-bit field at offset 173 — pure
    * byte reading, no codec. None when the magic or block is absent or
    * the fields are zero (a streamed FLAC may omit the total).
    */
  private[multimodal] def flacMeta(payload: Array[Byte]): Option[(Int, Long)] = {
    if (payload.length < 42 || payload(0) != 'f' || payload(1) != 'L' ||
      payload(2) != 'a' || payload(3) != 'C') return None
    // Metadata block header at offset 4: 1 bit last-flag + 7 bits type
    // (STREAMINFO = 0) + 24-bit length (34 for STREAMINFO).
    if ((payload(4) & 0x7f) != 0) return None
    val s = 8 // STREAMINFO body start
    // Bytes 10–17 of the body: rate(20) | channels-1(3) | bps-1(5) | totalSamples(36).
    val rate = ((payload(s + 10) & 0xff) << 12) | ((payload(s + 11) & 0xff) << 4) |
      ((payload(s + 12) & 0xff) >> 4)
    val total = ((payload(s + 13) & 0x0fL) << 32) | ((payload(s + 14) & 0xffL) << 24) |
      ((payload(s + 15) & 0xffL) << 16) | ((payload(s + 16) & 0xffL) << 8) |
      (payload(s + 17) & 0xffL)
    if (rate > 0 && total > 0) Some((rate, total)) else None
  }

  /** Deterministic in-memory FLAC header (magic + STREAMINFO block +
    * deterministic filler "frame" bytes) — fixture support for the real
    * compressed-audio decode gate. Duration is `totalSamples/sampleRate`
    * seconds.
    */
  def flacBytes(totalSamples: Long, sampleRate: Int, seed: Int): Array[Byte] = {
    val body = new Array[Byte](34)
    // min/max block size = 4096
    body(0) = 0x10; body(1) = 0x00; body(2) = 0x10; body(3) = 0x00
    // min/max frame size left 0 (unknown) — bytes 4..9
    body(10) = ((sampleRate >> 12) & 0xff).toByte
    body(11) = ((sampleRate >> 4) & 0xff).toByte
    // 4 low rate bits | channels-1 (3 bits, mono = 0) | top bit of bps-1
    // (16-bit audio: bps-1 = 15 = 0b01111, top bit 0, low 4 bits in byte 13).
    body(12) = ((sampleRate & 0xf) << 4).toByte
    body(13) = (0xf0 | ((totalSamples >> 32) & 0x0f)).toInt.toByte
    body(14) = ((totalSamples >> 24) & 0xff).toByte
    body(15) = ((totalSamples >> 16) & 0xff).toByte
    body(16) = ((totalSamples >> 8) & 0xff).toByte
    body(17) = (totalSamples & 0xff).toByte
    // bytes 18..33: MD5 of the (absent) audio data — deterministic filler.
    var i = 18
    while (i < 34) { body(i) = ((i * 17 + seed * 131) & 0xff).toByte; i += 1 }
    val frames = Array.tabulate(64 + math.abs(seed) % 64)(i => ((i * 37 + seed) & 0xff).toByte)
    val out = new Array[Byte](4 + 4 + 34 + frames.length)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last-metadata-block flag + type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34
    System.arraycopy(body, 0, out, 8, 34)
    System.arraycopy(frames, 0, out, 42, frames.length)
    out
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
            case "audio" => audioMeta(payload).orElse(mp3Meta(payload))
              .orElse(flacMeta(payload)).map { case (rate, fr) =>
                (0, 0, fr.toInt, fr.toDouble / rate) }
            case "video" => videoMeta(payload)
            case _ => None
          }
          val (w, h, f, d) = real.getOrElse(fakeMeta(kind, payload))
          Row(r.getLong(0), kind, payload.length.toLong, w, h, f, d)
        }
      }.toDF()
  }

  /** Average-hash (aHash) bits for one decoded image: 8x8 grayscale
    * grid by exact integer block averaging, one bit per cell
    * (1 = cell mean >= global mean), packed row-major MSB-first.
    *
    * Integer-exact throughout: luma is the ITU-R BT.601 integer fold
    * `(77R + 150G + 29B) >> 8`; cell edges are `floor(i·W/8)`; the
    * mean comparison cross-multiplies (`cellSum · totalPx >=
    * totalSum · cellPx`) so no division or float ever runs — the hash
    * is bit-reproducible across JVMs and replayable by an oracle on
    * formula-derived fixtures. (The cross-product stays inside a long
    * for images up to ~180 MP.)
    */
  private[multimodal] def aHashBits(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cellSum = new Array[Long](64)
    val cellPx = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
        val c = cy * 8 + x * 8 / w
        cellSum(c) += luma
        cellPx(c) += 1
        x += 1
      }
      y += 1
    }
    val totalSum = cellSum.sum
    val totalPx = w.toLong * h
    var bits = 0L
    var c = 0
    while (c < 64) {
      if (cellPx(c) > 0 && cellSum(c) * totalPx >= totalSum * cellPx(c))
        bits |= 1L << (63 - c)
      c += 1
    }
    bits
  }

  /** Perceptual average-hash over REAL decoded pixels — the classic
    * near-duplicate IMAGE signal: robust to re-encoding and uniform
    * brightness shifts (bits are relative to the image's own mean), and
    * the 64-bit output composes directly with the SimHash Hamming-band
    * machinery for corpus-scale image near-dup joins. Decode + hash run
    * inside one `mapPartitions` batch (same boundary as [[decode]]);
    * unparsable or non-image payloads yield a null hash so malformed
    * rows stay visible without killing the batch.
    *
    * Output: (asset_id, ahash_hex) — the packed bits as a 16-digit hex
    * string (hex rather than a signed long keeps the oracle replay free
    * of 2^63 overflow arithmetic).
    */
  def aHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ahash_hex", StringType, nullable = true)))
    implicit val enc = Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val hex =
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            if (img == null || img.getWidth <= 0 || img.getHeight <= 0) null
            else f"${aHashBits(img)}%016x"
          } catch { case _: java.io.IOException => null }
        Row(r.getLong(0), hex)
      }
    }.toDF()
  }

  /** 64-bit energy hash over REAL decoded PCM samples — the audio twin
    * of [[aHashBits]]: the sample stream splits into 64 equal-span
    * blocks, each block's summed |amplitude| compares against the
    * stream mean by cross-multiplication (`blockSum · n >= totalSum ·
    * blockCnt` — no division, no float), bit c set when block c is
    * louder than average. Amplitude-SCALE invariant (bits are relative
    * to the stream's own energy — a remastered/volume-shifted copy
    * hashes identically when the scaling is exact), and the 64-bit
    * output composes with [[graft.llm.Dedup.hammingPairs64]] exactly
    * like the image hash. Supports the JDK-parsable PCM containers at
    * 16-bit/mono/little-endian; anything else yields None.
    */
  private[multimodal] def audioHashBits(payload: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        if (n == 0) None
        else {
          val cellSum = new Array[Long](64)
          val cellCnt = new Array[Long](64)
          var i = 0
          while (i < n) {
            val v = (((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort).toLong
            val c = (i.toLong * 64 / n).toInt
            cellSum(c) += math.abs(v)
            cellCnt(c) += 1
            i += 1
          }
          val totalSum = cellSum.sum
          var bits = 0L
          var c = 0
          while (c < 64) {
            if (cellCnt(c) > 0 && cellSum(c) * n >= totalSum * cellCnt(c))
              bits |= 1L << (63 - c)
            c += 1
          }
          Some(bits)
        }
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** [[audioHashBits]] over a binary asset column, batched like
    * [[aHash]]: (asset_id, ahash_hex), null hex for undecodable rows.
    */
  def audioHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ahash_hex", StringType, nullable = true)))
    implicit val enc = Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val hex = audioHashBits(r.getAs[Array[Byte]](1))
          .map(b => f"$b%016x").orNull
        Row(r.getLong(0), hex)
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
