package graft.ext

import java.io.ByteArrayOutputStream
import java.util.Arrays

/** Pure-JVM AVI (RIFF) container codec for MJPEG video — the
  * mainstream-container counterpart of [[GifCodec.decodeAnimated]]:
  * a `RIFF('AVI ')` file whose single video stream is
  * Motion-JPEG, every frame an independent baseline-DCT JPEG decoded
  * by the real entropy decoder in [[JpegCodec]]. Unlike GIF there is
  * no inter-frame state (no deltas, no disposal), which is exactly
  * why MJPEG is the honest "frame-sample a mainstream container"
  * fixture: sampling can discard frames without decoding their
  * predecessors.
  *
  * Decoder contract (strict, like the other codecs — arbitrary bytes
  * must not false-positive):
  *  - `RIFF` magic, declared size consistent with the buffer, `AVI `
  *    form type;
  *  - a `hdrl` LIST whose `avih` declares the frame count and
  *    dimensions, with exactly one stream;
  *  - a `strl` LIST whose `strh` is `vids`/`MJPG` and whose `strf`
  *    BITMAPINFOHEADER matches the `avih` dimensions and declares
  *    `MJPG` compression;
  *  - a `movi` LIST containing only stream-0 video chunks
  *    (`00dc`/`00db`) and `JUNK` padding; every frame payload must
  *    decode via [[JpegCodec.decode]] to the declared dimensions;
  *  - the decoded frame count must equal `avih.dwTotalFrames`;
  *  - all chunks are word-aligned (odd sizes padded), and bounds are
  *    checked on every step.
  *
  * Reference behavior: the reference app has no media handling at
  * all (requirements.txt:1-4); this extends the multimodal column
  * story (SURVEY §2 ⊕) to a real video container.
  */
object AviCodec {

  /** Decoded MJPEG video: frame period plus per-frame decoded stats
    * (same [[JpegCodec.Decoded]] surface the image path uses).
    */
  final case class Video(usPerFrame: Int, frames: IndexedSeq[JpegCodec.Decoded]) {
    /** GIF-convention centisecond delay, for the shared frame schema. */
    def delayCs: Int = usPerFrame / 10000
  }

  /** Frame-count guard: a hostile header cannot make one row decode
    * unbounded work.
    */
  val MaxFrames: Int = 4096

  private def fourcc(s: String): Int =
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)

  private val RIFF = fourcc("RIFF"); private val AVI  = fourcc("AVI ")
  private val LIST = fourcc("LIST"); private val JUNK = fourcc("JUNK")
  private val HDRL = fourcc("hdrl"); private val AVIH = fourcc("avih")
  private val STRL = fourcc("strl"); private val STRH = fourcc("strh")
  private val STRF = fourcc("strf"); private val MOVI = fourcc("movi")
  private val VIDS = fourcc("vids"); private val MJPG = fourcc("MJPG")
  private val DC00 = fourcc("00dc"); private val DB00 = fourcc("00db")
  private val IDX1 = fourcc("idx1")

  def decode(payload: Array[Byte]): Option[Video] = {
    if (payload == null || payload.length < 24) return None
    def u32(p: Int): Long =
      (payload(p) & 0xffL) | ((payload(p + 1) & 0xffL) << 8) |
      ((payload(p + 2) & 0xffL) << 16) | ((payload(p + 3) & 0xffL) << 24)
    def fcc(p: Int): Int = u32(p).toInt

    if (fcc(0) != RIFF) return None
    val riffSize = u32(4)
    if (riffSize < 4 || 8 + riffSize > payload.length) return None
    if (fcc(8) != AVI) return None
    val end = (8 + riffSize).toInt

    var usPerFrame = 0; var totalFrames = -1
    var width = 0; var height = 0
    var avihSeen = false; var streamOk = false; var formatOk = false
    val frames = IndexedSeq.newBuilder[JpegCodec.Decoded]
    var nFrames = 0; var moviSeen = false

    def parseHdrl(from: Int, to: Int): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val id = fcc(p); val sz = u32(p + 4)
        if (sz < 0 || p + 8 + sz > to) return false
        val body = p + 8; val bodyEnd = (body + sz).toInt
        if (id == AVIH) {
          if (sz < 56 || avihSeen) return false
          usPerFrame = u32(body).toInt
          totalFrames = u32(body + 16).toInt
          val streams = u32(body + 24)
          width = u32(body + 32).toInt
          height = u32(body + 36).toInt
          if (streams != 1) return false
          avihSeen = true
        } else if (id == LIST && sz >= 4 && fcc(body) == STRL) {
          var q = body + 4
          while (q + 8 <= bodyEnd) {
            val sid = fcc(q); val ssz = u32(q + 4)
            if (ssz < 0 || q + 8 + ssz > bodyEnd) return false
            val sb = q + 8
            if (sid == STRH) {
              if (ssz < 56) return false
              if (fcc(sb) != VIDS || fcc(sb + 4) != MJPG) return false
              streamOk = true
            } else if (sid == STRF) {
              // BITMAPINFOHEADER: biSize, biWidth, biHeight, planes/bpp,
              // biCompression at +16
              if (ssz < 40 || u32(sb) < 40) return false
              if (u32(sb + 4).toInt != width || u32(sb + 8).toInt != height)
                return false
              if (fcc(sb + 16) != MJPG) return false
              formatOk = true
            } // other strl members (strd/strn) tolerated
            q += 8 + ssz.toInt + (ssz & 1).toInt
          }
        } else if (id != JUNK) {
          // unknown hdrl member (odml etc.) tolerated — skip
        }
        p += 8 + sz.toInt + (sz & 1).toInt
      }
      avihSeen
    }

    def parseMovi(from: Int, to: Int): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val id = fcc(p); val sz = u32(p + 4)
        if (sz < 0 || p + 8 + sz > to) return false
        if (id == DC00 || id == DB00) {
          nFrames += 1
          if (nFrames > MaxFrames || nFrames > totalFrames) return false
          val jpeg = Arrays.copyOfRange(payload, p + 8, (p + 8 + sz).toInt)
          JpegCodec.decode(jpeg) match {
            case Some(d) if d.width == width && d.height == height =>
              frames += d
            case _ => return false
          }
        } else if (id != JUNK) {
          return false // one declared stream: nothing else belongs here
        }
        p += 8 + sz.toInt + (sz & 1).toInt
      }
      true
    }

    var pos = 12
    while (pos + 8 <= end) {
      val id = fcc(pos); val sz = u32(pos + 4)
      if (sz < 0 || pos + 8 + sz > end) return None
      val body = pos + 8; val bodyEnd = (body + sz).toInt
      if (id == LIST) {
        if (sz < 4) return None
        val listType = fcc(body)
        if (listType == HDRL) {
          if (!parseHdrl(body + 4, bodyEnd)) return None
        } else if (listType == MOVI) {
          if (!avihSeen || !streamOk || !formatOk) return None // header must precede movi
          moviSeen = true
          if (!parseMovi(body + 4, bodyEnd)) return None
        } // other LISTs (INFO, odml) tolerated
      } else if (id != JUNK && id != IDX1) {
        return None
      }
      pos += 8 + sz.toInt + (sz & 1).toInt
    }

    if (!avihSeen || !streamOk || !formatOk || !moviSeen) return None
    if (usPerFrame <= 0 || width <= 0 || height <= 0) return None
    if (nFrames == 0 || nFrames != totalFrames) return None
    Some(Video(usPerFrame, frames.result()))
  }

  /** Fixture encoder: wrap pre-encoded JPEG frame payloads (use
    * [[JpegCodec.encodeGray]]/`encodeRgb` — block-constant content
    * round-trips bit-exactly) into a canonical single-stream MJPEG
    * AVI with word-aligned `00dc` chunks.
    */
  def encode(width: Int, height: Int, usPerFrame: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.size <= MaxFrames,
      s"1..$MaxFrames frames, got ${frames.size}")
    require(usPerFrame > 0, s"usPerFrame must be positive, got $usPerFrame")

    def u32(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    def tag(o: ByteArrayOutputStream, s: String): Unit =
      s.foreach(c => o.write(c & 0xff))
    def chunk(o: ByteArrayOutputStream, id: String, body: Array[Byte]): Unit = {
      tag(o, id); u32(o, body.length.toLong); o.write(body, 0, body.length)
      if ((body.length & 1) == 1) o.write(0) // word alignment
    }

    val avih = new ByteArrayOutputStream()
    u32(avih, usPerFrame.toLong); u32(avih, 0); u32(avih, 0); u32(avih, 0)
    u32(avih, frames.size.toLong); u32(avih, 0); u32(avih, 1); u32(avih, 0)
    u32(avih, width.toLong); u32(avih, height.toLong)
    (0 until 4).foreach(_ => u32(avih, 0))

    val strh = new ByteArrayOutputStream()
    tag(strh, "vids"); tag(strh, "MJPG")
    u32(strh, 0); u32(strh, 0); u32(strh, 0)           // flags, prio+lang, initial
    u32(strh, usPerFrame.toLong); u32(strh, 1000000L)  // scale, rate (frames/s = rate/scale)
    u32(strh, 0); u32(strh, frames.size.toLong)        // start, length
    u32(strh, 0); u32(strh, 0); u32(strh, 0)           // bufsize, quality, samplesize
    u32(strh, 0)                                       // rcFrame left, top
    u32(strh, (width.toLong & 0xffff) | ((height.toLong & 0xffff) << 16)) // right, bottom
    val strhB = strh.toByteArray
    require(strhB.length == 56, s"strh must be 56 bytes, got ${strhB.length}")

    val strf = new ByteArrayOutputStream()
    u32(strf, 40); u32(strf, width.toLong); u32(strf, height.toLong)
    u32(strf, (24L << 16) | 1)                          // planes=1, bpp=24
    tag(strf, "MJPG"); u32(strf, width.toLong * height * 3)
    u32(strf, 0); u32(strf, 0); u32(strf, 0); u32(strf, 0)

    val strl = new ByteArrayOutputStream()
    tag(strl, "strl")
    chunk(strl, "strh", strhB)
    chunk(strl, "strf", strf.toByteArray)

    val hdrl = new ByteArrayOutputStream()
    tag(hdrl, "hdrl")
    chunk(hdrl, "avih", avih.toByteArray)
    chunk(hdrl, "LIST", strl.toByteArray)

    val movi = new ByteArrayOutputStream()
    tag(movi, "movi")
    frames.foreach(f => chunk(movi, "00dc", f))

    val riffBody = new ByteArrayOutputStream()
    tag(riffBody, "AVI ")
    chunk(riffBody, "LIST", hdrl.toByteArray)
    chunk(riffBody, "LIST", movi.toByteArray)

    val out = new ByteArrayOutputStream()
    tag(out, "RIFF"); u32(out, riffBody.size().toLong)
    riffBody.writeTo(out)
    out.toByteArray
  }
}
