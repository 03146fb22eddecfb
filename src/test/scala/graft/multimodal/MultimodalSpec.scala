package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def assets = Seq(
    (0L, "image", "fake png bytes".getBytes("UTF-8")),
    (1L, "audio", "fake wav bytes".getBytes("UTF-8")),
    (2L, "video", "fake mp4 bytes".getBytes("UTF-8"))
  ).toDF("asset_id", "kind", "payload")

  test("decode emits the declared schema with deterministic stub metadata") {
    val out = Multimodal.decode(assets)
    assert(out.schema == Multimodal.decodedSchema)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    // deterministic: same payload -> same metadata on every run
    val again = Multimodal.decode(assets).collect().map(r => r.getLong(0) -> r).toMap
    for (id <- rows.keys) assert(rows(id) == again(id))
    // stub invariants (the text-byte "image" payload is unparsable, so
    // it falls back to the digest stub like audio/video)
    for (r <- rows.values) {
      assert(r.getInt(3) >= 160 && r.getInt(3) < 1920)  // width
      assert(r.getInt(4) >= 120 && r.getInt(4) < 1080)  // height
      assert(r.getLong(2) == 14L)                        // n_bytes
    }
    assert(rows(0L).getInt(5) == 1, "non-video assets have one frame")
    assert(rows(2L).getInt(5) >= 1, "video has frames")
  }

  test("decode parses real PNG and JPEG dimensions via javax.imageio") {
    val jpg = {
      val img = new java.awt.image.BufferedImage(
        33, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val real = Seq(
      (10L, "image", Multimodal.pngBytes(17, 9, seed = 3)),
      (11L, "image", jpg),
      (12L, "audio", Multimodal.pngBytes(17, 9, seed = 3)) // kind gates decode
    ).toDF("asset_id", "kind", "payload")
    val out = Multimodal.decode(real).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    assert(out(10L) == ((17, 9, 1)), s"PNG dims must be decoded for real: ${out(10L)}")
    assert(out(11L) == ((33, 21, 1)), s"JPEG dims must be decoded for real: ${out(11L)}")
    assert(out(12L)._1 >= 160, "audio payloads never go through the image decoder")
  }

  test("decode parses real WAV frame counts via javax.sound.sampled") {
    val real = Seq(
      (20L, "audio", Multimodal.wavBytes(nSamples = 1234, sampleRate = 8000, seed = 1)),
      (21L, "audio", "not a wav at all".getBytes("UTF-8")), // fake fallback
      (22L, "video", Multimodal.wavBytes(nSamples = 1234, sampleRate = 8000, seed = 1)) // kind gates decode
    ).toDF("asset_id", "kind", "payload")
    val out = Multimodal.decode(real).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6)))).toMap
    assert(out(20L) == ((0, 0, 1234, 1234 / 8000.0)),
      s"WAV frames/duration must be decoded for real: ${out(20L)}")
    assert(out(21L)._1 >= 160, "unparsable audio falls back to the deterministic fake")
    assert(out(22L)._1 >= 160, "video payloads never go through the audio decoder")
  }

  test("decode parses real MP4 container metadata via the box walker") {
    val real = Seq(
      (30L, "video", Multimodal.mp4Bytes(640, 360, 240, 600, 6000, seed = 5)),
      (31L, "video", "definitely not an mp4".getBytes("UTF-8")), // fake fallback
      (32L, "image", Multimodal.mp4Bytes(640, 360, 240, 600, 6000, seed = 5)) // kind gates decode
    ).toDF("asset_id", "kind", "payload")
    val out = Multimodal.decode(real).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6)))).toMap
    assert(out(30L) == ((640, 360, 240, 10.0)),
      s"MP4 dims/frames/duration must be decoded for real: ${out(30L)}")
    assert(out(31L)._1 >= 160, "unparsable video falls back to the deterministic fake")
    assert(out(32L)._3 == 1, "mp4 payloads never go through the image decoder")
  }

  test("decode parses real MP3 frame headers and FLAC STREAMINFO") {
    val real = Seq(
      (40L, "audio", Multimodal.mp3Bytes(nFrames = 7, seed = 2)),
      (41L, "audio", Multimodal.flacBytes(totalSamples = 48000L, sampleRate = 16000, seed = 3)),
      (42L, "audio", Array[Byte](0xff.toByte, 0xfb.toByte)), // truncated sync: fake fallback
      (43L, "video", Multimodal.mp3Bytes(nFrames = 7, seed = 2)) // kind gates decode
    ).toDF("asset_id", "kind", "payload")
    val out = Multimodal.decode(real).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(5), r.getDouble(6)))).toMap
    assert(out(40L) == ((0, 7 * 1152, 7 * 1152 / 32000.0)),
      s"MP3 sample count/duration must be decoded for real: ${out(40L)}")
    assert(out(41L) == ((0, 48000, 3.0)),
      s"FLAC totals must be decoded for real: ${out(41L)}")
    assert(out(42L)._1 >= 160, "truncated MP3 falls back to the deterministic fake")
    assert(out(43L)._1 >= 160, "video payloads never go through the audio decoder")
  }

  test("mp3Meta skips ID3v2 tags and rejects malformed streams") {
    val body = Multimodal.mp3Bytes(nFrames = 3, seed = 4)
    // prepend an ID3v2 tag: "ID3" v2.3, no flags, syncsafe body size 130
    val tagBody = new Array[Byte](130)
    val tag = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, (130 >> 7).toByte, (130 & 0x7f).toByte)
    assert(Multimodal.mp3Meta(tag ++ tagBody ++ body).contains((32000, 3 * 1152L)),
      "ID3v2-prefixed stream must parse")
    // free-format (bitrate index 0) is rejected, not guessed at
    val bad = body.clone(); bad(2) = ((0 << 4) | (2 << 2)).toByte
    assert(Multimodal.mp3Meta(bad).isEmpty)
    // trailing garbage after the last frame is rejected (not an MP3 tail we understand)
    assert(Multimodal.mp3Meta(body ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("flacMeta reads the 36-bit total and rejects non-STREAMINFO layouts") {
    // >2^32 samples exercises the high nibble of the 36-bit field
    val big = 5L * 1024 * 1024 * 1024
    assert(Multimodal.flacMeta(Multimodal.flacBytes(big, 96000, seed = 1))
      .contains((96000, big)))
    // a first block that isn't STREAMINFO is rejected
    val wrongType = Multimodal.flacBytes(1000L, 16000, seed = 1)
    wrongType(4) = 0x84.toByte // type 4 = VORBIS_COMMENT
    assert(Multimodal.flacMeta(wrongType).isEmpty)
    // a streamed FLAC with total-samples 0 is honestly rejected
    assert(Multimodal.flacMeta(Multimodal.flacBytes(0L, 16000, seed = 1)).isEmpty)
  }

  test("videoMeta handles 64-bit box sizes and rejects truncated moov") {
    val ok = Multimodal.mp4Bytes(320, 240, 48, 600, 1200, seed = 9)
    // rewrite the top-level moov header to the size==1 largesize form:
    // locate moov (after ftyp), then splice [1][moov][64-bit size]
    val ftypLen = ((ok(0) & 0xff) << 24) | ((ok(1) & 0xff) << 16) |
      ((ok(2) & 0xff) << 8) | (ok(3) & 0xff)
    val moovLen = ((ok(ftypLen) & 0xff) << 24) | ((ok(ftypLen + 1) & 0xff) << 16) |
      ((ok(ftypLen + 2) & 0xff) << 8) | (ok(ftypLen + 3) & 0xff)
    val before = ok.take(ftypLen)
    val moovPayload = ok.slice(ftypLen + 8, ftypLen + moovLen)
    val after = ok.drop(ftypLen + moovLen)
    val large = java.nio.ByteBuffer.allocate(16)
      .putInt(1).put("moov".getBytes("ISO-8859-1")).putLong(moovLen + 8L).array()
    val rewritten = before ++ large ++ moovPayload ++ after
    assert(Multimodal.videoMeta(rewritten).contains((320, 240, 48, 2.0)),
      "largesize moov must parse")
    // truncating inside moov must not throw — fall back to None
    assert(Multimodal.videoMeta(ok.take(ftypLen + 20)).isEmpty)
    // a moov missing stsz (fragmented-MP4 shape) is honestly rejected
    assert(Multimodal.videoMeta(before ++ after).isEmpty)
  }

  test("fake embedding has fixed dim and is deterministic") {
    val a = Multimodal.fakeEmbedding(assets, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.fakeEmbedding(assets, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 16))
  }

  test("resize fits into the box preserving aspect, never upscales") {
    val out = Multimodal.resize(Multimodal.decode(assets), maxSide = 256)
      .collect()
    for (r <- out) {
      val (w, h, ow, oh) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(ow <= 256 && oh <= 256)
      assert(ow <= w && oh <= h, "no upscaling")
      val inAspect = w.toDouble / h
      val outAspect = ow.toDouble / oh
      assert(math.abs(inAspect - outAspect) / inAspect < 0.02, "aspect preserved")
    }
  }

  test("frame sampling explodes only video assets") {
    val frames = Multimodal.sampleFrames(Multimodal.decode(assets), step = 10)
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames.keySet == Set(2L))
    assert(frames(2L) >= 1)
  }

  private def grayImage(w: Int, h: Int)(v: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  test("aHash block-averages: left-black/right-white 16x16 gives the 0x0f stripe") {
    val img = grayImage(16, 16)((x, _) => if (x < 8) 0 else 255)
    assert(Multimodal.aHashBits(img) == 0x0f0f0f0f0f0f0f0fL)
  }

  test("aHash is invariant to a uniform brightness shift (bits are mean-relative)") {
    def gradient(shift: Int) = grayImage(16, 16)((x, y) => 10 + x * 12 + y * 2 + shift)
    assert(Multimodal.aHashBits(gradient(0)) == Multimodal.aHashBits(gradient(10)),
      "a +10 shift moves every luma and the mean by exactly 10 — bits must not change")
  }

  test("aHash + hammingPairs64 compose: shifted twin pairs, distinct patterns don't") {
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[org.apache.spark.sql.Row] = Seq(
      org.apache.spark.sql.Row(0L, "image", Multimodal.grayPngBytes(8, 8, seed = 2)),
      org.apache.spark.sql.Row(1L, "image", Multimodal.grayPngBytes(8, 8, seed = 2, shift = 20)),
      org.apache.spark.sql.Row(2L, "image", Multimodal.grayPngBytes(8, 8, seed = 9))
    ).asJava
    val hashed = Multimodal.aHash(spark.createDataFrame(rows, Multimodal.assetSchema))
      .select(col("asset_id"), Multimodal.aHashLong(col("ahash_hex")).as("ahash"))
    val pairs = graft.llm.Dedup.hammingPairs64(hashed, "asset_id", "ahash")
    try {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got.contains((0L, 1L, 0)),
        s"brightness-shifted twin must hash identically and pair: $got")
      assert(!got.exists(p => p._2 == 2L || p._1 == 2L),
        s"the distinct pattern must not pair: $got")
    } finally pairs.unpersist()
  }

  test("aHash decodes real PNG bytes and yields null for garbage payloads") {
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[org.apache.spark.sql.Row] = Seq(
      org.apache.spark.sql.Row(0L, "image", Multimodal.pngBytes(8, 8, 1)),
      org.apache.spark.sql.Row(1L, "image", "not an image".getBytes("UTF-8"))
    ).asJava
    val out = Multimodal.aHash(spark.createDataFrame(rows, Multimodal.assetSchema))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // replicate the png pixel formula through the same integer fold
    val lum = (0 until 64).map { k =>
      val rgb = ((k % 8) * 31 + (k / 8) * 17 + 1 * 7919) & 0xffffff
      (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
    }
    val total = lum.map(_.toLong).sum
    val expected = (0 until 64).foldLeft(0L) { (acc, k) =>
      if (64L * lum(k) >= total) acc | (1L << (63 - k)) else acc
    }
    assert(out(0L).contains(f"$expected%016x"), s"got ${out(0L)}")
    assert(out(1L).isEmpty, "garbage bytes must yield a null hash, not a crash")
  }

  test("audioHash is amplitude-scale invariant on an exact half-amplitude twin") {
    val orig = Multimodal.audioHashBits(Multimodal.evenWavBytes(640, 8000, 3, 0))
    val half = Multimodal.audioHashBits(Multimodal.evenWavBytes(640, 8000, 3, 1))
    assert(orig.isDefined && orig == half,
      s"halving every even sample must preserve every mean-relative bit: $orig vs $half")
    val other = Multimodal.audioHashBits(Multimodal.evenWavBytes(640, 8000, 4, 0))
    assert(other.isDefined && other != orig, "a different sample formula must hash differently")
  }

  test("audioHash decodes real PCM and matches the sample-formula fold; garbage is null") {
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[org.apache.spark.sql.Row] = Seq(
      org.apache.spark.sql.Row(0L, "audio", Multimodal.evenWavBytes(640, 8000, 7, 0)),
      org.apache.spark.sql.Row(1L, "audio", "not audio at all".getBytes("UTF-8"))
    ).asJava
    val out = Multimodal.audioHash(spark.createDataFrame(rows, Multimodal.assetSchema))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // replicate the fixture formula through the same integer fold
    val n = 640
    val samples = (0 until n).map(i => 2 * ((i * 131 + 7 * 7919) % 32768 - 16384))
    val cellSum = new Array[Long](64); val cellCnt = new Array[Long](64)
    samples.zipWithIndex.foreach { case (v, i) =>
      val c = (i.toLong * 64 / n).toInt
      cellSum(c) += math.abs(v.toLong); cellCnt(c) += 1
    }
    val total = cellSum.sum
    val expected = (0 until 64).foldLeft(0L) { (acc, c) =>
      if (cellCnt(c) > 0 && cellSum(c) * n >= total * cellCnt(c)) acc | (1L << (63 - c)) else acc
    }
    assert(out(0L).contains(f"$expected%016x"), s"got ${out(0L)}")
    assert(out(1L).isEmpty, "garbage bytes must yield a null hash, not a crash")
  }
}
