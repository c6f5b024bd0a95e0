package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  // q101/q102/q103 fixture pattern bit: md5-nibble parity (avalanche —
  // a linear-congruential parity repeats patterns across groups)
  private def pbit(g: Long, j: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    ((md.digest(s"$g|$j".getBytes("UTF-8"))(0) >> 4) & 0xf) % 2 == 1
  }

  private def media() = {
    val rows = Seq(
      Row(1L, "image", Array.tabulate(256)(_.toByte), Row(800, 600, null, null)),
      Row(2L, "audio", Array.tabulate(64)(i => (i * 3).toByte), Row(null, null, 44100, 2000)),
      Row(3L, "video", Array.tabulate(1024)(i => (i % 7).toByte), Row(1920, 1080, null, 60000)),
      Row(4L, "image", null, Row(10, 10, null, null)),  // broken payload
    )
    spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
  }

  test("decodeFeatures: deterministic stub features, null payloads dropped") {
    val feats = Multimodal.decodeFeatures(media()).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.features.length == Multimodal.StubCodec.dim))
    assert(feats.forall(_.features.forall(f => f >= 0f && f <= 1f)))
    // determinism
    val again = Multimodal.decodeFeatures(media()).collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames: n frames per row, bytes partition the payload") {
    val byId = Multimodal.sampleFrames(media(), 4)
      .groupBy("media_id").agg(count(lit(1)).as("n"), sum("frame_bytes").as("b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((4L, 256L)))
    assert(byId(3L) == ((4L, 1024L)))
    assert(!byId.contains(4L))
  }

  test("sampleFrames partitions exactly when payload size is not divisible by n") {
    val rows = Seq(Row(9L, "audio", Array.tabulate(11)(_.toByte),
      Row(null, null, 8000, 100)))
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val frames = Multimodal.sampleFrames(df, 3)
      .orderBy("frame_idx")
      .select("frame_bytes").collect().map(_.getInt(0)).toSeq
    assert(frames.sum == 11, s"frames $frames must cover all 11 bytes")
    assert(frames == Seq(3, 4, 4))
    // reassembled frames equal the original payload (no gaps/overlap)
    val bytes = Multimodal.sampleFrames(df, 3).orderBy("frame_idx")
      .select("frame").collect().flatMap(_.getAs[Array[Byte]](0)).toSeq
    assert(bytes == Array.tabulate(11)(_.toByte).toSeq)
  }

  test("BmpCodec: encode->decode roundtrip recovers dimensions and channel means") {
    import graft.ext.BmpCodec
    // width 5 -> 15 data bytes/row, padded to 16: exercises padding
    val w = 5; val h = 4
    val payload = BmpCodec.encode(w, h, (x, y) => (10 * x, 20 * y, x + y))
    assert(payload.length == 54 + 16 * h)
    val d = BmpCodec.decode(payload).get
    assert(d.width == w && d.height == h)
    val px = for { y <- 0 until h; x <- 0 until w } yield (10 * x, 20 * y, x + y)
    def mean(f: ((Int, Int, Int)) => Int) = px.map(f).sum.toDouble / px.size / 255.0
    assert(math.abs(d.meanR - mean(_._1)) < 1e-12)
    assert(math.abs(d.meanG - mean(_._2)) < 1e-12)
    assert(math.abs(d.meanB - mean(_._3)) < 1e-12)
    // top-half blue mean: rows y=0,1 (bottom-up storage must be undone)
    val top = for { y <- 0 until 2; x <- 0 until w } yield x + y
    assert(math.abs(d.meanBTop - top.sum.toDouble / top.size / 255.0) < 1e-12)
  }

  test("BmpCodec: rejects non-BMP payloads; decodeFeatures dispatches by content") {
    import graft.ext.BmpCodec
    assert(BmpCodec.decode("BMnot really a bitmap at all".getBytes).isEmpty)
    assert(BmpCodec.decode(Array.tabulate(100)(_.toByte)).isEmpty)
    assert(BmpCodec.decode(null).isEmpty)
    // truncated valid header fails the size check
    val ok = BmpCodec.encode(3, 2, (_, _) => (1, 2, 3))
    assert(BmpCodec.decode(ok.dropRight(1)).isEmpty)
    // decodeFeatures: BMP rows get pixel features, text rows keep stub
    val rows = Seq(
      Row(1L, "image", ok, Row(null, null, null, null)),
      Row(2L, "image", "plain text".getBytes, Row(null, null, null, null)))
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val feats = Multimodal.decodeFeatures(df).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).features(4) == (3 / 100.0).toFloat)  // f4 = width/100
    assert(feats(2L).features sameElements
      Multimodal.StubCodec.decode("plain text".getBytes))
    // decodeImages drops the non-BMP row instead of failing
    val imgs = Multimodal.decodeImages(df).collect()
    assert(imgs.map(_.media_id).toSeq == Seq(1L))
    assert(imgs.head.width == 3 && imgs.head.height == 2)
  }

  test("WavCodec: stereo roundtrip de-interleaves channels; negatives decode signed") {
    import graft.ext.WavCodec
    // ch0 ramps positive, ch1 ramps negative: a decoder that mixes or
    // swaps channels (or reads unsigned) gets different means
    val payload = WavCodec.encode(2, 8000, 100, (i, c) => if (c == 0) i * 3 else -(i * 5))
    assert(payload.length == 44 + 100 * 2 * 2)
    val d = WavCodec.decode(payload).get
    assert(d.channels == 2 && d.sampleRate == 8000 && d.frames == 100)
    val exp0 = (0 until 100).map(_ * 3).sum.toDouble / 100
    val exp1 = (0 until 100).map(i => -(i * 5)).sum.toDouble / 100
    assert(d.meanCh0 == exp0 && d.meanCh1 == exp1)
    assert(d.peak == 99 * 5)
  }

  test("WavCodec: rejects non-WAV payloads and malformed chunks") {
    import graft.ext.WavCodec
    assert(WavCodec.decode("RIFFxxxxWAVEnot a fmt chunk here".getBytes).isEmpty)
    assert(WavCodec.decode(Array.tabulate(100)(_.toByte)).isEmpty)
    assert(WavCodec.decode(null).isEmpty)
    val ok = WavCodec.encode(1, 8000, 10, (i, _) => i)
    assert(WavCodec.decode(ok).isDefined)
    assert(WavCodec.decode(ok.dropRight(1)).isEmpty)   // RIFF size mismatch
    // a BMP payload must not enter the audio path (and vice versa)
    val bmp = graft.ext.BmpCodec.encode(3, 2, (_, _) => (1, 2, 3))
    assert(WavCodec.decode(bmp).isEmpty)
    assert(graft.ext.BmpCodec.decode(ok).isEmpty)
  }

  test("AdpcmCodec: unit-step triangle roundtrips BIT-EXACTLY (q94's oracle premise)") {
    import graft.ext.AdpcmCodec
    // consecutive deltas ∈ {-1,0,1} are exactly representable at step
    // index 0 (step 7: 7>>3 = 0, 7>>3 + 7>>2 = 1), and every magnitude
    // < 4 keeps the index pinned — so the real nibble decode must
    // reproduce the source samples exactly, across blocks and channels
    def s(i: Int, c: Int): Int = (if (c == 0) 500 else -800) + math.abs((i % 20) - 10)
    val payload = AdpcmCodec.encode(2, 8000, 99, s)
    assert(payload.length == 60 + (99 / 9) * 8 * 2)
    val d = AdpcmCodec.decode(payload).get
    assert(d.channels == 2 && d.sampleRate == 8000 && d.frames == 99)
    val exp0 = (0 until 99).map(s(_, 0)).sum.toDouble / 99
    val exp1 = (0 until 99).map(s(_, 1)).sum.toDouble / 99
    assert(d.meanCh0 == exp0, s"${d.meanCh0} != $exp0")
    assert(d.meanCh1 == exp1, s"${d.meanCh1} != $exp1")
    val expAbs = (0 until 99).flatMap(i => Seq(s(i, 0).abs, s(i, 1).abs)).sum.toDouble / 198
    assert(d.meanAbs == expAbs)
    assert(d.peak == 800) // ch1 peaks at tri=0: |-800 + 0|
  }

  test("AdpcmCodec: hand-derived step-table vector decodes exactly") {
    import graft.ext.AdpcmCodec
    import java.nio.{ByteBuffer, ByteOrder}
    // One mono block built byte-by-byte (NOT via encode), with the
    // expected samples derived by hand from the public IMA recurrence:
    // pred=0, index=3 (step 10):
    //   nib 5 (0b0101): diff = 10>>3 + 10 + 10>>2 = 13 → 13,  idx 3+4=7  (step 14)
    //   nib 0:          diff = 14>>3 = 1           → 14,  idx 6        (step 13)
    //   nib 8:          diff = -(13>>3) = -1       → 13,  idx 5        (step 12)
    //   nib 15:         diff = -(1+12+6+3) = -22   → -9,  idx 5+8=13   (step 25)
    //   nib 0 ×4:       +3 → -6 (idx 12, step 23); +2 → -4 (idx 11, 21);
    //                   +2 → -2 (idx 10, step 19); +2 → 0  (idx 9)
    val nibbles = Seq(5, 0, 8, 15, 0, 0, 0, 0)
    val expected = Seq(0, 13, 14, 13, -9, -6, -4, -2, 0)
    val buf = ByteBuffer.allocate(68).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(60)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x0011).putShort(1).putInt(8000).putInt(7111)
      .putShort(8).putShort(4).putShort(2).putShort(9)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(9)
      .put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(0).put(3.toByte).put(0.toByte) // header: pred 0, index 3
    for (i <- 0 until 4)
      buf.put((nibbles(2 * i) | (nibbles(2 * i + 1) << 4)).toByte) // low nibble first
    val d = AdpcmCodec.decode(buf.array()).get
    assert(d.frames == 9)
    assert(d.meanCh0 == expected.sum.toDouble / 9, s"${d.meanCh0}")
    assert(d.meanAbs == expected.map(_.abs).sum.toDouble / 9)
    assert(d.peak == 14)
  }

  test("AdpcmCodec: lossy regime tracks a large-delta waveform within step bounds") {
    import graft.ext.AdpcmCodec
    // a ±4000-swing square-ish wave forces the index up the table and
    // through clamping: decode is lossy but must stay within ~the
    // largest step of the source (tracking, not garbage)
    def s(i: Int): Int = if ((i / 8) % 2 == 0) 4000 else -4000
    val payload = AdpcmCodec.encode(1, 8000, 81, (i, _) => s(i))
    val d = AdpcmCodec.decode(payload).get
    assert(d.frames == 81)
    // mean of the source is ~0 (up/down blocks balance within ±500)
    assert(math.abs(d.meanCh0) < 1500, s"mean drifted: ${d.meanCh0}")
    assert(d.meanAbs > 2000 && d.meanAbs < 6000, s"meanAbs off: ${d.meanAbs}")
    assert(d.peak <= 32767)
  }

  test("AdpcmCodec: rejects non-ADPCM payloads; PCM and ADPCM WAVs are disjoint") {
    import graft.ext.{AdpcmCodec, WavCodec}
    assert(AdpcmCodec.decode(null).isEmpty)
    assert(AdpcmCodec.decode(Array.tabulate(100)(_.toByte)).isEmpty)
    val pcm = WavCodec.encode(1, 8000, 10, (i, _) => i)
    assert(AdpcmCodec.decode(pcm).isEmpty)       // audioFormat 1 != 17
    val adpcm = AdpcmCodec.encode(1, 8000, 9, (i, _) => i)
    assert(WavCodec.decode(adpcm).isEmpty)       // audioFormat 17 != 1
    assert(AdpcmCodec.decode(adpcm).isDefined)
    assert(AdpcmCodec.decode(adpcm.dropRight(1)).isEmpty)  // RIFF size mismatch
    // step index > 88 in a block header must be rejected, not index OOB
    val bad = adpcm.clone()
    bad(62) = 90.toByte                          // header index byte of block 0
    assert(AdpcmCodec.decode(bad).isEmpty)
    // nonzero reserved header byte → reject (strictness contract)
    val bad2 = adpcm.clone()
    bad2(63) = 1.toByte
    assert(AdpcmCodec.decode(bad2).isEmpty)
  }

  test("codecs reject crafted headers whose sizes overflow Int arithmetic") {
    import graft.ext.{BmpCodec, WavCodec}
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV: a chunk declaring size near Int.MaxValue must fail the bounds
    // check, not wrap `pos + 8 + size` negative and walk off the payload.
    val wav = ByteBuffer.allocate(100).order(ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(92)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(Int.MaxValue - 15)
    assert(WavCodec.decode(wav.array()).isEmpty)
    // BMP: width > ~715M overflows `width * 3`; rowSize must be computed
    // in Long so the pixel-bounds check rejects it instead of AIOOBE.
    val bmp = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
      .putInt(40).putInt(0x2AAAAAAB).putInt(1)           // 715827883 x 1
      .putShort(1).putShort(24).putInt(0)
    assert(BmpCodec.decode(bmp.array()).isEmpty)
    // BMP: height = Int.MinValue survives math.abs as negative — reject.
    val bmp2 = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bmp2.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
      .putInt(40).putInt(2).putInt(Int.MinValue)
      .putShort(1).putShort(24).putInt(0)
    assert(BmpCodec.decode(bmp2.array()).isEmpty)
  }

  test("resizeMeta clamps to max side preserving aspect") {
    val resized = Multimodal.resizeMeta(media(), 400)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => (r.getLong(0), (r.get(1), r.get(2)))).toMap
    assert(resized(1L) == ((400, 300)))
    assert(resized(3L) == ((400, 225)))
    assert(resized(4L) == ((10, 10)))  // already under the cap
  }

  test("PngCodec: roundtrip recovers means under EVERY scanline filter type") {
    import graft.ext.PngCodec
    val w = 7; val h = 6
    def rgb(x: Int, y: Int) = ((x * 40 + y) % 256, (y * 30 + x) % 256, (x * 11 + y * 17) % 256)
    // exact expected means
    val px = for (y <- 0 until h; x <- 0 until w) yield rgb(x, y)
    val mr = px.map(_._1).sum.toDouble / px.size / 255.0
    val mg = px.map(_._2).sum.toDouble / px.size / 255.0
    val mb = px.map(_._3).sum.toDouble / px.size / 255.0
    val topHalf = (h + 1) / 2
    val mbt = (for (y <- 0 until topHalf; x <- 0 until w) yield rgb(x, y)._3)
      .sum.toDouble / (w * topHalf) / 255.0
    // one PNG per FIXED filter type plus the cycling default
    for (f <- 0 to 4) {
      val d = PngCodec.decode(PngCodec.encode(w, h, rgb, _ => f))
        .getOrElse(fail(s"filter $f failed to decode"))
      assert(d.width == w && d.height == h)
      assert(math.abs(d.meanR - mr) < 1e-12 && math.abs(d.meanG - mg) < 1e-12 &&
        math.abs(d.meanB - mb) < 1e-12, s"filter $f means off")
      assert(math.abs(d.meanBTop - mbt) < 1e-12, s"filter $f top-half off")
    }
    val cyc = PngCodec.decode(PngCodec.encode(w, h, rgb)).get
    assert(math.abs(cyc.meanB - mb) < 1e-12)
  }

  test("PngCodec: rejects corrupt payloads; decodeImages dispatches BMP and PNG") {
    import graft.ext.{BmpCodec, PngCodec}
    val png = PngCodec.encode(4, 3, (x, y) => (x, y, x + y))
    // corrupt CRC
    val badCrc = png.clone(); badCrc(badCrc.length - 1) = (badCrc.last ^ 0x1).toByte
    assert(PngCodec.decode(badCrc).isEmpty)
    // truncated IDAT
    assert(PngCodec.decode(png.take(png.length - 20)).isEmpty)
    // text bytes
    assert(PngCodec.decode("definitely not a png".getBytes).isEmpty)
    // grayscale color type rejected (flip IHDR byte + fix nothing -> crc fails first,
    // so build a structurally-valid-but-wrong-colortype by re-encoding is not possible;
    // the CRC check subsumes it)
    val media = Seq(
      (1L, BmpCodec.encode(3, 2, (x, y) => (x, y, x + y))),
      (2L, png),
      (3L, "garbage".getBytes)
    ).toDF("media_id", "payload")
    val got = graft.ext.Multimodal.decodeImages(media).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got == Map(1L -> ((3, 2)), 2L -> ((4, 3))))  // garbage dropped
  }

  test("GifCodec: LZW roundtrip recovers means; width growth, dict reset and KwKwK exercised") {
    import graft.ext.GifCodec
    def pal(n: Int) = Array.tabulate(n)(i => ((5 * i) % 256, (7 * i) % 256, (3 * i) % 256))
    def expected(w: Int, h: Int, palette: Array[(Int, Int, Int)], idx: (Int, Int) => Int) = {
      val px = for (y <- 0 until h; x <- 0 until w) yield palette(idx(x, y))
      val top = for (y <- 0 until (h + 1) / 2; x <- 0 until w) yield palette(idx(x, y))
      (px.map(_._1).sum.toDouble / px.size / 255.0,
       px.map(_._2).sum.toDouble / px.size / 255.0,
       px.map(_._3).sum.toDouble / px.size / 255.0,
       top.map(_._3).sum.toDouble / top.size / 255.0)
    }
    def check(w: Int, h: Int, palette: Array[(Int, Int, Int)], idx: (Int, Int) => Int): Unit = {
      val d = GifCodec.decode(GifCodec.encode(w, h, palette, idx))
        .getOrElse(fail(s"${w}x$h palette=${palette.length} failed to decode"))
      val (mr, mg, mb, mbt) = expected(w, h, palette, idx)
      assert(d.width == w && d.height == h)
      assert(math.abs(d.meanR - mr) < 1e-12 && math.abs(d.meanG - mg) < 1e-12 &&
        math.abs(d.meanB - mb) < 1e-12 && math.abs(d.meanBTop - mbt) < 1e-12,
        s"${w}x$h means off")
    }
    // small image, 64-color palette (the q87 shape)
    check(7, 5, pal(64), (x, y) => (3 * x + 5 * y) % 64)
    // uniform image: immediate KwKwK chains (aaaa... encodes cScSS...)
    check(9, 4, pal(8), (_, _) => 5)
    // 2-color palette -> minCode clamps to 2
    check(6, 6, pal(2), (x, y) => (x + y) % 2)
    // non-power-of-two palette padded up
    check(8, 3, pal(100), (x, y) => (x * 11 + y * 17) % 100)
    // large noisy image: >4096 dict entries forces mid-stream clear +
    // reset, and every code width 7..12 is traversed along the way
    check(90, 80, pal(64), (x, y) => (3 * x + 5 * y + (x * y % 11)) % 64)
  }

  test("GifCodec: rejects corrupt payloads; decodeImages dispatches GIF") {
    import graft.ext.GifCodec
    val gif = GifCodec.encode(4, 3,
      Array.tabulate(4)(i => (i * 60, i * 50, i * 40)), (x, y) => (x + y) % 4)
    assert(GifCodec.decode(gif).isDefined)
    assert(GifCodec.decode(gif.take(gif.length - 1)).isEmpty)   // no trailer
    assert(GifCodec.decode(gif ++ Array(0.toByte)).isEmpty)     // trailing garbage
    val badSig = gif.clone(); badSig(3) = '9'.toByte
    assert(GifCodec.decode(badSig).isEmpty)
    assert(GifCodec.decode("GIF87a but not really a gif".getBytes).isEmpty)
    assert(GifCodec.decode(Array[Byte]()).isEmpty)
    // truncated mid-LZW-stream: structurally walks but pixel count short
    val cut = gif.take(gif.length - 4) ++ Array(0.toByte, 0x3b.toByte)
    assert(GifCodec.decode(cut).isEmpty)
    val media = Seq(
      (1L, gif),
      (2L, "garbage".getBytes)
    ).toDF("media_id", "payload")
    val got = graft.ext.Multimodal.decodeImages(media).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got == Map(1L -> ((4, 3))))
  }

  test("GifCodec animated: compositing, transparency, disposal-2 restore, local palettes") {
    import graft.ext.GifCodec
    import graft.ext.GifCodec.AnimFrame
    // 4x2 canvas; palette 0=black(bg) 1=red 2=green 3=blue.
    // f0 fills red; f1 draws a 2x1 rect at (1,0) where fx=0 is
    // TRANSPARENT (so only (2,0) turns green); f2 paints (0,1)-(1,1)
    // blue with disposal 2 (restored to background after showing);
    // f3 is all-transparent (draws nothing) and must see f2's rect
    // already restored to black.
    val pal = Array((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))
    val frames = Seq(
      AnimFrame(0, 0, 4, 2, delayCs = 10, disposal = 1, index = (_, _) => 1),
      AnimFrame(1, 0, 2, 1, delayCs = 20, disposal = 1, transparentIdx = 0,
        index = (fx, _) => if (fx == 0) 0 else 2),
      AnimFrame(0, 1, 2, 1, delayCs = 30, disposal = 2, index = (_, _) => 3),
      AnimFrame(3, 1, 1, 1, delayCs = 40, disposal = 0, transparentIdx = 0,
        index = (_, _) => 0))
    val fs = GifCodec.decodeAnimated(GifCodec.encodeAnimated(4, 2, pal, frames))
      .getOrElse(fail("decodeAnimated failed"))
    assert(fs.length == 4)
    assert(fs.map(_.frameIdx) == Vector(0, 1, 2, 3))
    assert(fs.map(_.delayCs) == Vector(10, 20, 30, 40))
    assert(fs.forall(f => f.canvas.width == 4 && f.canvas.height == 2))
    def means(f: Int) = (fs(f).canvas.meanR, fs(f).canvas.meanG, fs(f).canvas.meanB)
    val eps = 1e-12
    def close(a: (Double, Double, Double), b: (Double, Double, Double)) =
      math.abs(a._1 - b._1) < eps && math.abs(a._2 - b._2) < eps &&
        math.abs(a._3 - b._3) < eps
    assert(close(means(0), (1.0, 0.0, 0.0)), s"f0 ${means(0)}")
    assert(close(means(1), (7.0 / 8, 1.0 / 8, 0.0)), s"f1 ${means(1)}")
    assert(close(means(2), (5.0 / 8, 1.0 / 8, 2.0 / 8)), s"f2 ${means(2)}")
    // after f2's disposal its two pixels are black again; f3 draws nothing
    assert(close(means(3), (5.0 / 8, 1.0 / 8, 0.0)), s"f3 ${means(3)}")
    // top-half blue mean: row 0 never has blue
    assert(fs.forall(_.canvas.meanBTop < eps))

    // local color table: second frame's palette overrides the global
    val lct = Seq(
      AnimFrame(0, 0, 4, 2, disposal = 1, index = (_, _) => 1),
      AnimFrame(0, 0, 4, 2, disposal = 1,
        localPalette = Some(Array((0, 0, 0), (0, 0, 255))), index = (_, _) => 1))
    val fs2 = GifCodec.decodeAnimated(GifCodec.encodeAnimated(4, 2, pal, lct))
      .getOrElse(fail("LCT animation failed to decode"))
    assert(math.abs(fs2(0).canvas.meanR - 1.0) < eps)
    assert(math.abs(fs2(1).canvas.meanB - 1.0) < eps &&
      fs2(1).canvas.meanR < eps, "local palette ignored")

    // single-image GIF: decodeAnimated yields ONE frame == decode()
    val single = GifCodec.encode(5, 4,
      Array.tabulate(8)(i => (i * 30, i * 20, i * 10)), (x, y) => (x + 2 * y) % 8)
    val one = GifCodec.decodeAnimated(single).getOrElse(fail("single-image failed"))
    val img = GifCodec.decode(single).get
    assert(one.length == 1 && one.head.delayCs == 0)
    assert(one.head.canvas == img)
  }

  test("GifCodec animated: strictness — disposal 3, bad bg index, overrun rect all rejected") {
    import graft.ext.GifCodec
    import graft.ext.GifCodec.AnimFrame
    val pal = Array((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))
    val gif = GifCodec.encodeAnimated(4, 2, pal, Seq(
      AnimFrame(0, 0, 4, 2, delayCs = 5, disposal = 1, index = (_, _) => 1),
      AnimFrame(1, 0, 2, 1, delayCs = 5, disposal = 1, index = (_, _) => 2)))
    assert(GifCodec.decodeAnimated(gif).isDefined)
    // GCE layout: header(13) + GCT(12) + NETSCAPE(19) puts the first
    // GCE's packed byte at offset 47; force disposal=3 there
    assert((gif(44) & 0xff) == 0x21 && (gif(45) & 0xff) == 0xf9,
      "fixture layout shifted — GCE not at expected offset")
    val disp3 = gif.clone(); disp3(47) = (disp3(47) | 0x0c).toByte
    assert(GifCodec.decodeAnimated(disp3).isEmpty, "disposal 3 accepted")
    // background index outside the global table
    val badBg = gif.clone(); badBg(11) = 9.toByte // gctEntries = 4
    assert(GifCodec.decodeAnimated(badBg).isEmpty, "bg index 9 >= 4 accepted")
    // truncation and trailing garbage
    assert(GifCodec.decodeAnimated(gif.take(gif.length - 1)).isEmpty)
    assert(GifCodec.decodeAnimated(gif ++ Array(0.toByte)).isEmpty)
    assert(GifCodec.decodeAnimated("GIF89a soup".getBytes).isEmpty)
    // frame rect overrunning the logical screen is unencodable here,
    // so patch the second image descriptor's left edge instead: find
    // the second 0x2c and push left to 3 (3 + 2 > 4)
    val d2 = {
      var c = -1; var at = -1
      for (p <- 0 until gif.length if at < 0) {
        if ((gif(p) & 0xff) == 0x2c) { c += 1; if (c == 1) at = p }
      }
      val m = gif.clone(); m(at + 1) = 3.toByte; m
    }
    assert(GifCodec.decodeAnimated(d2).isEmpty, "overrun rect accepted")
  }

  test("decodeVideoFrames: real composited frames, sampling, invalid payloads dropped") {
    import graft.ext.{GifCodec, Multimodal}
    import graft.ext.GifCodec.AnimFrame
    val pal = Array((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))
    val anim = GifCodec.encodeAnimated(4, 2, pal,
      (0 until 4).map(f => AnimFrame(0, 0, 4, 2, delayCs = f + 1,
        disposal = 1, index = (_, _) => (f % 3) + 1)))
    val media = Seq(
      (1L, anim),
      (2L, "not a gif".getBytes)
    ).toDF("media_id", "payload")
    val all = Multimodal.decodeVideoFrames(media, every = 1).collect()
    assert(all.map(_.media_id).toSet == Set(1L), "garbage payload kept")
    assert(all.length == 4 && all.forall(_.n_frames == 4))
    val sampled = Multimodal.decodeVideoFrames(media, every = 2).collect()
      .sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2), "every=2 sampling wrong")
    assert(sampled.forall(f => f.width == 4 && f.height == 2))
    // frame 2 is all-blue (f % 3 + 1 = 3): feature 0 = meanB = 1
    assert(math.abs(sampled(1).features(0) - 1.0f) < 1e-6)
  }

  test("AviCodec: MJPEG frames decode bit-exactly; sampling; strict rejection; WAV disjoint") {
    import graft.ext.{AviCodec, JpegCodec, Multimodal, WavCodec}
    // three block-constant frames -> bit-exact through the real JPEG
    // entropy decoder, so frame means are exactly v/255
    val vals = Seq(40, 200, 120)
    val frames = vals.map(v => JpegCodec.encodeGray(16, 8, (_, _) => v))
    val avi = AviCodec.encode(16, 8, 40000, frames)
    val dec = AviCodec.decode(avi).get
    assert(dec.usPerFrame == 40000 && dec.delayCs == 4)
    assert(dec.frames.length == 3)
    dec.frames.zip(vals).foreach { case (f, v) =>
      assert(f.width == 16 && f.height == 8)
      assert(math.abs(f.meanG - v / 255.0) < 1e-12, s"frame mean ${f.meanG} != ${v / 255.0}")
    }
    // different frame sizes re-exercise the word-alignment padding
    // (odd-length JPEG payloads get a pad byte after their chunk)
    val oddFrames = vals.map(v => JpegCodec.encodeGray(8, 8, (_, _) => v))
    assert(AviCodec.decode(AviCodec.encode(8, 8, 10000, oddFrames)).get.frames.length == 3)
    // strictness: truncation, wrong form type, frame-count mismatch,
    // non-JPEG frame bytes, foreign chunk in movi — all None
    assert(AviCodec.decode(avi.take(avi.length - 5)).isEmpty, "truncated accepted")
    val wav = avi.clone(); wav(8) = 'W'; wav(9) = 'A'; wav(10) = 'V'; wav(11) = 'E'
    assert(AviCodec.decode(wav).isEmpty, "WAVE form type accepted")
    val badCount = avi.clone()
    // dwTotalFrames lives at hdrl avih body+16; find it via the known
    // layout: RIFF(12) LIST(8) 'hdrl'(4) 'avih'(4) size(4) -> body at 36
    assert(new String(badCount.slice(24, 28), "ASCII") == "avih")
    badCount(32 + 16) = 9
    assert(AviCodec.decode(badCount).isEmpty, "frame-count mismatch accepted")
    // a real WAV must never decode as AVI, nor the reverse
    val realWav = WavCodec.encode(1, 8000, 16, (f, _) => f * 100)
    assert(AviCodec.decode(realWav).isEmpty)
    assert(WavCodec.decode(avi).isEmpty)
    // dispatch: decodeVideoFrames routes AVI to the JPEG path, keeps
    // GIF on the composite path, drops junk
    import spark.implicits._
    val media = Seq(1L -> avi, 2L -> "junk".getBytes).toDF("media_id", "payload")
    val out = Multimodal.decodeVideoFrames(media, every = 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.media_id).toSet == Set(1L))
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2) && out.forall(_.n_frames == 3))
    assert(math.abs(out(1).features(0) - 120 / 255.0f) < 1e-6)
  }

  test("decodePixels: BMP/PNG/GIF pixel decode agrees across codecs and with the source") {
    import graft.ext.{BmpCodec, GifCodec, PngCodec}
    val rgb = (x: Int, y: Int) => ((x + 4 * y) % 256, (10 * x) % 256, (7 * y) % 256)
    val (bw, bh, bpx) = BmpCodec.decodePixels(BmpCodec.encode(5, 4, rgb)).get
    assert(bw == 5 && bh == 4)
    for (y <- 0 until 4; x <- 0 until 5) {
      val (r, g, b) = rgb(x, y)
      assert(bpx(y * 5 + x) == ((r << 16) | (g << 8) | b), s"bmp pixel ($x,$y)")
    }
    val (_, _, ppx) = PngCodec.decodePixels(PngCodec.encode(5, 4, rgb)).get
    assert(ppx.toSeq == bpx.toSeq, "png pixels differ from bmp")
    val pal = Array.tabulate(8)(i => (i * 30, i * 20, i * 10))
    val (_, _, gpx) = GifCodec.decodePixels(
      GifCodec.encode(5, 4, pal, (x, y) => (x + y) % 8)).get
    for (y <- 0 until 4; x <- 0 until 5) {
      val (r, g, b) = pal((x + y) % 8)
      assert(gpx(y * 5 + x) == ((r << 16) | (g << 8) | b), s"gif pixel ($x,$y)")
    }
    // size guard: maxPixels below the image size rejects, not allocates
    assert(BmpCodec.decodePixels(BmpCodec.encode(5, 4, rgb), maxPixels = 19).isEmpty)
  }

  test("resizeImages: exact truncating box means, partial edge blocks, cross-codec dispatch") {
    import graft.ext.{BmpCodec, Multimodal, PngCodec}
    val rgb = (x: Int, y: Int) => (x + 4 * y, 10 * x, 7 * y)
    val bmp = BmpCodec.encode(4, 4, rgb)
    val media = Seq((1L, bmp), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.resizeImages(media, 2).collect()
    assert(out.map(_.media_id).toSet == Set(1L), "invalid payload kept")
    val r0 = out.head
    assert(r0.orig_width == 4 && r0.orig_height == 4 &&
      r0.width == 2 && r0.height == 2)
    val px = BmpCodec.decodePixels(r0.payload).get._3
    // hand-computed truncating block means of the 2x2 source blocks
    assert(px(0) == ((2 << 16) | (5 << 8) | 3), "block (0,0)")
    assert(px(1) == ((4 << 16) | (25 << 8) | 3), "block (1,0)")
    assert(px(2) == ((10 << 16) | (5 << 8) | 17), "block (0,1)")
    // odd dims: 5x3 by 2 -> 3x2, the corner block is ONE pixel, exact
    val odd = Multimodal.resizeImages(
      Seq((3L, BmpCodec.encode(5, 3, rgb))).toDF("media_id", "payload"), 2)
      .collect().head
    assert(odd.width == 3 && odd.height == 2)
    val opx = BmpCodec.decodePixels(odd.payload).get._3
    val (cr, cg, cb) = rgb(4, 2)
    assert(opx(5) == ((cr << 16) | (cg << 8) | cb), "corner partial block")
    // factor 1 is the identity on pixels
    val id1 = Multimodal.resizeImages(
      Seq((4L, bmp)).toDF("media_id", "payload"), 1).collect().head
    assert(BmpCodec.decodePixels(id1.payload).get._3.toSeq ==
      BmpCodec.decodePixels(bmp).get._3.toSeq)
    // a PNG of the same image resizes to a byte-identical BMP payload
    val rp = Multimodal.resizeImages(
      Seq((5L, PngCodec.encode(4, 4, rgb))).toDF("media_id", "payload"), 2)
      .collect().head
    assert(rp.payload.toSeq == r0.payload.toSeq, "png-sourced resize differs")
  }

  test("ImageHash: aHash is container-invariant, hand-checkable, and guards tiny images") {
    import graft.ext.{BmpCodec, ImageHash, PngCodec}
    // 16x16, constant 2x2 blocks: bright checkerboard -> hash bits
    // are exactly the checkerboard (block mean 200000/40000, global
    // mean between them)
    val v = (x: Int, y: Int) => if (((x / 2) + (y / 2)) % 2 == 0) 200 else 40
    val rgb = (x: Int, y: Int) => (v(x, y), v(x, y), v(x, y))
    val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(16, 16, rgb)).get
    val hash = ImageHash.aHash(w, h, px).get
    var expected = 0L
    for (j <- 0 until 64) if ((j % 8 + j / 8) % 2 == 0) expected |= 1L << j
    assert(hash == expected, f"hash $hash%016x != $expected%016x")
    // the SAME pixels through a different container hash identically
    val (pw, ph, ppx) = PngCodec.decodePixels(PngCodec.encode(16, 16, rgb)).get
    assert(ImageHash.aHash(pw, ph, ppx).get == hash, "container changed the hash")
    // one flipped block flips exactly one bit
    val rgb2 = (x: Int, y: Int) =>
      if (x < 2 && y < 2) (40, 40, 40) else rgb(x, y)
    val (_, _, px2) = BmpCodec.decodePixels(BmpCodec.encode(16, 16, rgb2)).get
    val hash2 = ImageHash.aHash(16, 16, px2).get
    assert(java.lang.Long.bitCount(hash ^ hash2) == 1, "one-block edit != 1 bit")
    // sub-8x8 images refuse (empty blocks)
    assert(ImageHash.aHash(7, 16, new Array[Int](7 * 16)).isEmpty)
    assert(ImageHash.aHash(16, 7, new Array[Int](16 * 7)).isEmpty)
  }

  test("nearDupImages: banded hamming join recovers the planted pair set exactly") {
    import graft.ext.{BmpCodec, ImageHash}
    // q101's fixture shape: groups of 4, member m flips blocks j < m
    def img(id: Long): Array[Byte] = {
      val g = id / 4; val m = (id % 4).toInt
      BmpCodec.encode(16, 16, (x, y) => {
        val j = (y / 2) * 8 + x / 2
        val bit = pbit(g, j) ^ (j < m)
        val vv = if (bit) 200 else 40
        (vv, vv, vv)
      })
    }
    val media = ((0L until 8L).map(id => (id, img(id))) :+ (99L, "junk".getBytes))
      .toDF("media_id", "payload")
    val pairs = ImageHash.nearDupImages(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // within-group distances: d(a,b) = |m_a - m_b| flipped blocks
    val want = (for {
      g <- 0 to 1; a <- 0 to 3; b <- a + 1 to 3
    } yield ((g * 4 + a).toLong, (g * 4 + b).toLong, b - a)).toSet
    val wantKeys = want.map(t => (t._1, t._2))
    val gotWithin = pairs.filter(p => wantKeys.contains((p._1, p._2)))
    assert(gotWithin == want, s"within-group pairs wrong:\n got $gotWithin\n want $want")
    // no pair involves the junk row; cross-group pairs only if the
    // group patterns genuinely collide within 3 bits (recomputed here)
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("AudioHash: fingerprint hand-checks, PCM≡ADPCM container invariance, mixing, guards") {
    import graft.ext.{AdpcmCodec, AudioHash, WavCodec}
    // strictly rising energy ramp -> every delta bit set (-1L)
    val ramp = WavCodec.decodeSamples(
      WavCodec.encode(1, 8000, 130, (f, _) => f * 10)).get
    assert(AudioHash.fingerprint(ramp._1, ramp._3).contains(-1L))
    // strictly falling -> no bit set
    val fall = WavCodec.decodeSamples(
      WavCodec.encode(1, 8000, 130, (f, _) => (130 - f) * 10)).get
    assert(AudioHash.fingerprint(fall._1, fall._3).contains(0L))
    // stereo anti-phase mixes to silence -> all energies 0 -> hash 0
    val anti = WavCodec.decodeSamples(
      WavCodec.encode(2, 8000, 130, (f, c) => if (c == 0) f else -f)).get
    assert(AudioHash.fingerprint(anti._1, anti._3).contains(0L))
    // the SAME unit-step triangle through PCM and ADPCM containers
    // fingerprints identically (ADPCM is bit-exact in that regime)
    val tri = (f: Int) => if (f <= 65) f else 130 - f
    val pcm = WavCodec.decodeSamples(
      WavCodec.encode(1, 8000, 130, (f, _) => tri(f))).get
    val adp = AdpcmCodec.decodeSamples(
      AdpcmCodec.encode(1, 8000, 130, (f, _) => tri(f), samplesPerBlock = 65)).get
    assert(adp._3.toSeq == pcm._3.toSeq, "ADPCM samples diverge from PCM")
    assert(AudioHash.fingerprint(adp._1, adp._3) ==
      AudioHash.fingerprint(pcm._1, pcm._3))
    // under 65 frames: empty segments would divide the stream unevenly
    assert(AudioHash.fingerprint(1, Array.fill(64)(5)).isEmpty)
    // decodeSamples interleaving: stereo roundtrip in frame-major order
    val st = WavCodec.decodeSamples(
      WavCodec.encode(2, 8000, 70, (f, c) => f * 2 + c)).get
    assert(st._1 == 2 && st._3.length == 140)
    assert(st._3(10 * 2) == 20 && st._3(10 * 2 + 1) == 21)
  }

  test("nearDupAudio: banded pairs equal the brute-force pair set; junk dropped") {
    import graft.ext.{AudioHash, WavCodec}
    // q102's fixture shape over 3 groups
    def wav(id: Long): Array[Byte] = {
      val g = id / 4; val m = (id % 4).toInt
      WavCodec.encode(1, 8000, 130, (f, _) => {
        val k = f / 2
        val bit = pbit(g, k) ^ (k < m)
        if (bit) 1500 else 300
      })
    }
    val rows = (0L until 12L).map(id => (id, wav(id))) :+ (99L, "junk".getBytes)
    val media = rows.toDF("media_id", "payload")
    val got = AudioHash.nearDupAudio(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the SAME hashes the stage computes
    val sigs = AudioHash.audioHashes(media).as[(Long, Long)].collect().toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want, s"banded != brute force:\n got $got\n want $want")
    assert(want.nonEmpty, "fixture planted no qualifying pairs")
    assert(!got.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("JpegCodec: block-constant grayscale roundtrip is BIT-EXACT; smooth RGB within tolerance") {
    import graft.ext.JpegCodec
    // block-constant gray: DC-only blocks, quant 8 divides 8*(v-128)
    // exactly -> decode must reproduce every pixel, so means are EXACT
    val w = 24; val h = 16
    def g(x: Int, y: Int) = (31 + (x / 8) * 7 + (y / 8) * 11) % 256
    val d = JpegCodec.decode(JpegCodec.encodeGray(w, h, g))
      .getOrElse(fail("gray decode failed"))
    val px = for (y <- 0 until h; x <- 0 until w) yield g(x, y)
    val mean = px.sum.toDouble / px.size / 255.0
    val top = (for (y <- 0 until (h + 1) / 2; x <- 0 until w) yield g(x, y))
    val mbt = top.sum.toDouble / top.size / 255.0
    assert(d.width == w && d.height == h)
    assert(d.meanR == mean && d.meanG == mean && d.meanB == mean, "gray roundtrip not exact")
    assert(d.meanBTop == mbt)
    // non-multiple-of-8 dims: edge blocks replicate, crop must be exact
    val d2 = JpegCodec.decode(JpegCodec.encodeGray(13, 9, (x, y) => ((x / 8) * 50 + (y / 8) * 90) % 256))
      .getOrElse(fail("cropped decode failed"))
    assert(d2.width == 13 && d2.height == 9)
    // full lossy path: smooth RGB gradient through FDCT/quant/Huffman/
    // IDCT/color transform — channel means within JPEG loss tolerance
    val wc = 32; val hc = 24
    def rgb(x: Int, y: Int) = (x * 8 % 256, y * 10 % 256, (x * 4 + y * 4) % 256)
    val dc = JpegCodec.decode(JpegCodec.encodeRgb(wc, hc, rgb))
      .getOrElse(fail("rgb decode failed"))
    val cpx = for (y <- 0 until hc; x <- 0 until wc) yield rgb(x, y)
    val mr = cpx.map(_._1).sum.toDouble / cpx.size / 255.0
    val mg = cpx.map(_._2).sum.toDouble / cpx.size / 255.0
    val mb = cpx.map(_._3).sum.toDouble / cpx.size / 255.0
    assert(math.abs(dc.meanR - mr) < 0.02 && math.abs(dc.meanG - mg) < 0.02 &&
      math.abs(dc.meanB - mb) < 0.02, s"rgb means off: ${dc.meanR} vs $mr")
    // 4:2:0: subsampled chroma + interleaved MCUs (4Y+Cb+Cr) decode to
    // the same means within tolerance, incl. non-MCU-aligned dims
    for ((w4, h4) <- Seq((32, 24), (21, 13))) {
      val px4 = for (y <- 0 until h4; x <- 0 until w4) yield rgb(x, y)
      val d4 = JpegCodec.decode(JpegCodec.encodeRgb420(w4, h4, rgb))
        .getOrElse(fail(s"4:2:0 ${w4}x$h4 decode failed"))
      assert(d4.width == w4 && d4.height == h4)
      val m4r = px4.map(_._1).sum.toDouble / px4.size / 255.0
      val m4g = px4.map(_._2).sum.toDouble / px4.size / 255.0
      val m4b = px4.map(_._3).sum.toDouble / px4.size / 255.0
      assert(math.abs(d4.meanR - m4r) < 0.03 && math.abs(d4.meanG - m4g) < 0.03 &&
        math.abs(d4.meanB - m4b) < 0.03, s"4:2:0 ${w4}x$h4 means off: ${d4.meanR} vs $m4r")
    }
  }

  test("JpegCodec: restart markers (DRI/RSTn) decode bit-exactly; wrong RST index rejected") {
    import graft.ext.JpegCodec
    // 6x2 MCUs of block-constant gray, restart every 2 MCUs: the
    // stream byte-aligns at each boundary, cycles RST0..RSTn and
    // resets DC prediction — decode must still be bit-exact
    val w = 48; val h = 16
    def g(x: Int, y: Int) = (7 + (x / 8) * 23 + (y / 8) * 41) % 256
    val jpg = JpegCodec.encodeGray(w, h, g, restartInterval = 2)
    val d = JpegCodec.decode(jpg).getOrElse(fail("DRI decode failed"))
    val px = for (y <- 0 until h; x <- 0 until w) yield g(x, y)
    val mean = px.sum.toDouble / px.size / 255.0
    assert(d.width == w && d.height == h)
    assert(d.meanR == mean, s"DRI roundtrip not exact: ${d.meanR} vs $mean")
    // corrupt ONE restart marker's index -> the cycling check fails
    val rstAt = jpg.indices.drop(2).find(i =>
      (jpg(i - 1) & 0xff) == 0xff && (jpg(i) & 0xff) == 0xd0).get
    val bad = jpg.clone(); bad(rstAt) = 0xd5.toByte
    assert(JpegCodec.decode(bad).isEmpty)
    // interval 0 in DRI = restarts disabled; plain stream still fine
    assert(JpegCodec.decode(JpegCodec.encodeGray(16, 8, g)).isDefined)
  }

  test("JpegCodec: rejects corrupt payloads; decodeImages dispatches JPEG") {
    import graft.ext.JpegCodec
    val jpg = JpegCodec.encodeGray(16, 8, (x, y) => (x * 16 + y) % 256)
    assert(JpegCodec.decode(jpg).isDefined)
    assert(JpegCodec.decode(jpg.take(jpg.length - 1)).isEmpty)  // no EOI
    assert(JpegCodec.decode(jpg ++ Array(0.toByte)).isEmpty)    // trailing garbage
    assert(JpegCodec.decode("not a jpeg at all".getBytes).isEmpty)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    // progressive (SOF2) rejected: flip the SOF0 marker byte
    val sofAt = {
      var i = 2
      while (!((jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    val prog = jpg.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // dimension-overflow guard: patch SOF dims to 65535x65535
    val big = jpg.clone()
    big(sofAt + 5) = 0xff.toByte; big(sofAt + 6) = 0xff.toByte
    big(sofAt + 7) = 0xff.toByte; big(sofAt + 8) = 0xff.toByte
    assert(JpegCodec.decode(big).isEmpty)
    val media = Seq(
      (1L, jpg),
      (2L, "garbage".getBytes)
    ).toDF("media_id", "payload")
    val got = graft.ext.Multimodal.decodeImages(media).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got == Map(1L -> ((16, 8))))
  }

  test("codec fuzz: random corruption and cross-codec bytes never throw — None or a clean decode") {
    // the decode contract every codec shares: one corrupt file must
    // not fail the job, so decode() may only return None (or a valid
    // Decoded if the mutation kept the file well-formed) — NEVER throw
    import graft.ext._
    val rnd = new scala.util.Random(12345)
    val valid: Seq[(String, Array[Byte])] = Seq(
      "bmp" -> BmpCodec.encode(9, 7, (x, y) => (x * 20 % 256, y * 30 % 256, (x + y) % 256)),
      "png" -> PngCodec.encode(9, 7, (x, y) => (x * 20 % 256, y * 30 % 256, (x + y) % 256)),
      "gif" -> GifCodec.encode(9, 7,
        Array.tabulate(16)(i => (i * 16, i * 8, i * 4)), (x, y) => (x + y) % 16),
      "gif-anim" -> GifCodec.encodeAnimated(9, 7,
        Array.tabulate(16)(i => (i * 16, i * 8, i * 4)),
        Seq(
          GifCodec.AnimFrame(0, 0, 9, 7, delayCs = 4, disposal = 1,
            index = (x, y) => (x + y) % 16),
          GifCodec.AnimFrame(2, 1, 5, 4, delayCs = 4, disposal = 2,
            transparentIdx = 0, index = (x, y) => (x * 3 + y) % 16),
          GifCodec.AnimFrame(1, 2, 6, 3, delayCs = 4, disposal = 1,
            localPalette = Some(Array.tabulate(8)(i => (i * 9, i * 5, i * 3))),
            index = (x, y) => (x + 2 * y) % 8))),
      "jpg" -> JpegCodec.encodeGray(16, 16, (x, y) => (x * 16 + y) % 256),
      "jpg-dri" -> JpegCodec.encodeGray(32, 16, (x, y) => (x * 16 + y) % 256,
        restartInterval = 1),
      "wav" -> WavCodec.encode(2, 8000, 50, (f, c) => (f * 31 + c * 7) % 65536 - 32768),
      "adpcm" -> AdpcmCodec.encode(2, 8000, 45, (f, c) => (f * 31 + c * 7) % 65536 - 32768),
      "avi" -> AviCodec.encode(16, 8, 40000,
        (0 until 3).map(f => JpegCodec.encodeGray(16, 8, (x, y) => (x * 16 + y + f * 31) % 256))))
    def all(p: Array[Byte]): Unit = {
      BmpCodec.decode(p); PngCodec.decode(p); GifCodec.decode(p)
      GifCodec.decodeAnimated(p)
      BmpCodec.decodePixels(p); PngCodec.decodePixels(p); GifCodec.decodePixels(p)
      JpegCodec.decode(p); WavCodec.decode(p); AdpcmCodec.decode(p)
      WavCodec.decodeSamples(p); AdpcmCodec.decodeSamples(p)
      AviCodec.decode(p)
    }
    for ((_, payload) <- valid) {
      // byte mutations
      for (_ <- 1 to 400) {
        val m = payload.clone()
        for (_ <- 0 to rnd.nextInt(8))
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        all(m)
      }
      // truncations and extensions
      for (cut <- Seq(1, 2, payload.length / 3, payload.length / 2, payload.length - 1))
        all(payload.take(cut))
      all(payload ++ Array.fill(7)(rnd.nextInt(256).toByte))
      // every codec fed every OTHER codec's valid bytes
      all(payload)
    }
    // pure random byte soup, varied lengths
    for (_ <- 1 to 300) all(Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte))
  }

  test("PngCodec: CRC-valid header with overflowing dimensions returns None, not a crash") {
    import graft.ext.PngCodec
    // Hand-build a structurally valid (signature + CRC-correct chunks) PNG
    // whose IHDR dimensions overflow Int stride / rawLen arithmetic. Before
    // the Long-arithmetic guard this threw NegativeArraySizeException out of
    // decode — crashing the task instead of honoring the skip-corrupt contract.
    def chunk(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length); bb.put(tpe.getBytes("US-ASCII")); bb.put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(body)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
    def ihdr(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(13)
      bb.putInt(w); bb.putInt(h)
      bb.put(8.toByte); bb.put(2.toByte); bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte)
      bb.array()
    }
    def png(w: Int, h: Int): Array[Byte] =
      sig ++ chunk("IHDR", ihdr(w, h)) ++ chunk("IDAT", Array.emptyByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    // width*3 overflows Int (715,827,883 * 3 > Int.MaxValue)
    assert(PngCodec.decode(png(715827883, 1)).isEmpty)
    // stride fine, height*(1+stride) overflows Int
    assert(PngCodec.decode(png(100000, 100000)).isEmpty)
    // sanity: the guard doesn't reject plausible large-but-valid dims outright
    // (this one fails later for lack of IDAT data, still None, still no throw)
    assert(PngCodec.decode(png(1024, 768)).isEmpty)
  }
}
