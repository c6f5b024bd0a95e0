package graft.ext

import java.util.zip.{CRC32, DataFormatException, Inflater}

/** Pure-JVM codec for 8-bit RGB (color type 2, non-interlaced) PNG —
  * the second REAL image decoder behind [[Multimodal]] next to
  * [[BmpCodec]]; JDK-only (`java.util.zip` for inflate/CRC, no native
  * libraries beyond the JDK's own zlib binding).
  *
  * Decode implements the full scanline-filter spec: None/Sub/Up/
  * Average/Paeth are all reversed, and [[encode]] deliberately CYCLES
  * filter types across rows so every unfilter path is exercised by
  * the roundtrip (q84). Chunk CRCs are verified; IHDR constraints,
  * exact inflate size, and the signature make arbitrary bytes unable
  * to false-positive into the image path (same strictness contract as
  * BmpCodec).
  *
  * Encode emits STORED (uncompressed) zlib blocks, so the payload
  * size is a pure formula of the dimensions — which is what lets the
  * q84 oracle hash-check `n_bytes` without running zlib in SQL:
  * `len = 8 + 25 + (12 + 2 + 5·ceil(raw/65535) + raw + 4) + 12` with
  * `raw = h·(1 + 3w)`. The decoder accepts any valid deflate stream,
  * stored or compressed.
  */
object PngCodec {

  /** Same feature surface as [[BmpCodec.Decoded]]: channel means in
    * [0,1] and the top-half blue mean (rows y < ⌈h/2⌉ — PNG rows are
    * top-down, so this catches a decoder with inverted row order).
    */
  final case class Decoded(width: Int, height: Int,
                           meanB: Double, meanG: Double, meanR: Double,
                           meanBTop: Double)

  private val Sig: Array[Byte] =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode `rgb(x, y) => (r, g, b)` (y=0 is the TOP row) as an
    * RGB8 PNG. `filterForRow` picks the scanline filter (default
    * cycles 0..4 so decode exercises every unfilter path).
    */
  def encode(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int),
             filterForRow: Int => Int = _ % 5): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val bpp = 3
    val stride = width * bpp
    // raw image bytes (no filter bytes) for predictor lookups
    val img = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        val o = y * stride + x * bpp
        img(o) = r.toByte; img(o + 1) = g.toByte; img(o + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    // filtered scanlines: 1 filter byte + stride per row
    val raw = new Array[Byte](height * (1 + stride))
    y = 0
    while (y < height) {
      val f = math.floorMod(filterForRow(y), 5)
      val ro = y * (1 + stride)
      raw(ro) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = img(y * stride + i) & 0xff
        val left = if (i >= bpp) img(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) img((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) img((y - 1) * stride + i - bpp) & 0xff else 0
        val filt = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(ro + 1 + i) = filt.toByte
        i += 1
      }
      y += 1
    }
    // zlib stream with STORED deflate blocks (size formula-derivable)
    val nBlocks = (raw.length + 65534) / 65535
    val z = java.nio.ByteBuffer.allocate(2 + raw.length + 5 * nBlocks + 4)
    z.put(0x78.toByte).put(0x01.toByte)
    var off = 0
    while (off < raw.length) {
      val n = math.min(65535, raw.length - off)
      val last = off + n == raw.length
      z.put(if (last) 1.toByte else 0.toByte)
      z.put((n & 0xff).toByte).put(((n >> 8) & 0xff).toByte)
      z.put((~n & 0xff).toByte).put(((~n >> 8) & 0xff).toByte)
      z.put(raw, off, n)
      off += n
    }
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    z.putInt(adler.getValue.toInt)
    val idat = z.array()

    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
      .put(2.toByte)    // color type: truecolor RGB
      .put(0.toByte)    // compression
      .put(0.toByte)    // filter method
      .put(0.toByte)    // non-interlaced

    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length)
      out.put(tpe.getBytes("US-ASCII")).put(data)
      val crc = new CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    Sig ++ chunk("IHDR", ihdr.array()) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** None unless the payload is a structurally valid RGB8
    * non-interlaced PNG (signature, IHDR constraints, chunk CRCs,
    * exact inflated size, known filter types).
    */
  def decode(payload: Array[Byte]): Option[Decoded] =
    decodeRaw(payload).map { case (width, height, stride, raw) =>
      var sr = 0L; var sg = 0L; var sb = 0L; var sbTop = 0L
      val topHalf = (height + 1) / 2
      var yy = 0
      while (yy < height) {
        val ro = yy * (1 + stride)
        var x = 0
        while (x < width) {
          val o = ro + x * 3
          sr += raw(o) & 0xff
          sg += raw(o + 1) & 0xff
          val b = raw(o + 2) & 0xff
          sb += b
          if (yy < topHalf) sbTop += b
          x += 1
        }
        yy += 1
      }
      val n = width.toLong * height
      Decoded(width, height,
        sb.toDouble / n / 255.0,
        sg.toDouble / n / 255.0,
        sr.toDouble / n / 255.0,
        sbTop.toDouble / (width.toLong * topHalf) / 255.0)
    }

  /** Full pixel decode for pixel-transforming stages (resize): same
    * validation as [[decode]], rows in image order, packed 0xRRGGBB.
    */
  def decodePixels(payload: Array[Byte],
                   maxPixels: Long = 1L << 26): Option[(Int, Int, Array[Int])] =
    decodeRaw(payload).flatMap { case (width, height, stride, raw) =>
      if (width.toLong * height > maxPixels) None
      else {
        val px = new Array[Int](width * height)
        var yy = 0
        while (yy < height) {
          val ro = yy * (1 + stride)
          var x = 0
          while (x < width) {
            val o = ro + x * 3
            px(yy * width + x) = ((raw(o) & 0xff) << 16) |
              ((raw(o + 1) & 0xff) << 8) | (raw(o + 2) & 0xff)
            x += 1
          }
          yy += 1
        }
        Some((width, height, px))
      }
    }

  /** Parse + inflate + unfilter to reconstructed scanlines: row y's
    * RGB bytes start at `y * (1 + stride)` in the returned buffer
    * (the +1 filter-byte slots are dead after unfiltering).
    */
  private def decodeRaw(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 8 + 25 + 12 + 12) return None
    var i = 0
    while (i < 8) { if (payload(i) != Sig(i)) return None; i += 1 }
    val buf = java.nio.ByteBuffer.wrap(payload) // PNG ints are big-endian
    var pos = 8
    var width = 0; var height = 0; var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= payload.length && !sawIend) {
      val len = buf.getInt(pos)
      if (len < 0 || pos + 12 + len.toLong > payload.length) return None
      val tpe = new String(payload, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(payload, pos + 4, 4 + len)
      if (crc.getValue.toInt != buf.getInt(pos + 8 + len)) return None
      tpe match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          width = buf.getInt(pos + 8)
          height = buf.getInt(pos + 12)
          val bitDepth = payload(pos + 16); val colorType = payload(pos + 17)
          val comp = payload(pos + 18); val filt = payload(pos + 19)
          val interlace = payload(pos + 20)
          if (width <= 0 || height <= 0 || bitDepth != 8 || colorType != 2 ||
              comp != 0 || filt != 0 || interlace != 0) return None
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(payload, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      pos += 12 + len
    }
    if (!sawIhdr || !sawIend) return None
    // Long arithmetic first: width ≥ 715,827,883 overflows Int stride to
    // negative, which would sail past a post-hoc rawLen guard and throw
    // NegativeArraySizeException at allocation (task crash, not None).
    val strideL = width.toLong * 3
    val rawLenL = height.toLong * (1L + strideL)
    if (strideL >= Int.MaxValue || rawLenL > Int.MaxValue) return None
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      // must decode to EXACTLY the scanline bytes
      if (off != raw.length || inf.inflate(new Array[Byte](1)) != 0) return None
    } catch { case _: DataFormatException => return None }
    finally inf.end()

    // unfilter in place row by row
    val bpp = 3
    var yy = 0
    while (yy < height) {
      val ro = yy * (1 + stride)
      val f = raw(ro) & 0xff
      if (f > 4) return None
      // previous reconstructed row was shifted to start at its own
      // ro' = (yy-1)*(1+stride) = ro - 1 - stride
      val upBase = ro - 1 - stride
      var i2 = 0
      while (i2 < stride) {
        val cur = raw(ro + 1 + i2) & 0xff
        val left = if (i2 >= bpp) raw(ro + 1 + i2 - bpp) & 0xff else 0
        val up = if (yy > 0) raw(upBase + i2) & 0xff else 0
        val ul = if (yy > 0 && i2 >= bpp) raw(upBase + i2 - bpp) & 0xff else 0
        val recon = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth(left, up, ul)
        }
        raw(ro + 1 + i2) = recon.toByte
        i2 += 1
      }
      // shift reconstructed row left over the filter byte so `up`
      // lookups above read reconstructed bytes at ro - stride + i
      System.arraycopy(raw, ro + 1, raw, ro, stride)
      yy += 1
    }

    Some((width, height, stride, raw))
  }

  /** Same 8-slot feature formula as [[BmpCodec.features]] so image
    * features are codec-independent.
    */
  def features(d: Decoded): Array[Float] = Array(
    d.meanB.toFloat,
    d.meanG.toFloat,
    d.meanR.toFloat,
    (0.114 * d.meanB + 0.587 * d.meanG + 0.299 * d.meanR).toFloat,
    (d.width / 100.0).toFloat,
    (d.height / 100.0).toFloat,
    d.meanBTop.toFloat,
    (d.width.toDouble / d.height).toFloat)
}
