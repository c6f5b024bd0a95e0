package graft.ext

/** Pure-JVM codec for uncompressed 24-bpp Windows BMP (BITMAPFILEHEADER
  * + 40-byte BITMAPINFOHEADER, BGR pixel order, 4-byte row padding,
  * bottom-up rows unless height is negative). No native libraries —
  * this is the one REAL media decoder behind [[Multimodal]]; other
  * kinds still go through the documented [[Multimodal.StubCodec]].
  *
  * Correctness surface: q62 synthesizes valid BMPs from a per-doc pixel
  * formula, decodes them with THIS parser, and the DuckDB oracle
  * recomputes the expected features from the formula alone — so header
  * layout, bottom-up row order (top-half feature), padding exclusion
  * (channel means) and size math (n_bytes) are all hash-checked.
  */
object BmpCodec {

  /** Channel means are in [0,1] (divided by 255); `meanBTop` is the
    * blue mean over the TOP half of the image (rows y < ⌈h/2⌉ in image
    * coordinates) — the one feature that detects a decoder ignoring
    * bottom-up row order.
    */
  final case class Decoded(width: Int, height: Int,
                           meanB: Double, meanG: Double, meanR: Double,
                           meanBTop: Double)

  /** Encode `rgb(x, y) => (r, g, b)` (image coordinates, y=0 is the
    * TOP row) as a bottom-up 24-bpp BMP.
    */
  def encode(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putInt(0)                  // reserved
    buf.putInt(54)                 // pixel-data offset
    buf.putInt(40)                 // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)             // positive → bottom-up
    buf.putShort(1)                // planes
    buf.putShort(24)               // bits per pixel
    buf.putInt(0)                  // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835)               // 72 DPI
    buf.putInt(2835)
    buf.putInt(0)                  // palette size
    buf.putInt(0)                  // important colors
    var y = height - 1             // bottom-up: last image row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** None unless the payload is a structurally valid uncompressed
    * 24-bpp BMP (magic, header sizes, declared file size == payload
    * length, pixel data in bounds) — strict enough that arbitrary text
    * bytes can never false-positive into the image path.
    */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    if (payload == null || payload.length < 54 ||
        payload(0) != 'B'.toByte || payload(1) != 'M'.toByte) return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fileSize = buf.getInt(2)
    val offset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (fileSize != payload.length || hdrSize != 40 || planes != 1 ||
        bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0 ||
        rawHeight == Int.MinValue || offset < 54) return None
    val topDown = rawHeight < 0
    val h = math.abs(rawHeight)
    // Row size in Long: a header width > ~715M overflows `width * 3` in
    // Int, making rowSize small/negative and defeating the bounds check.
    val rowSizeL = ((width * 3L + 3L) / 4L) * 4L
    if (rowSizeL > Int.MaxValue ||
        offset.toLong + rowSizeL * h > payload.length) return None
    val rowSize = rowSizeL.toInt
    val topHalf = (h + 1) / 2
    var sb = 0L; var sg = 0L; var sr = 0L; var sbTop = 0L
    var row = 0
    while (row < h) {
      val y = if (topDown) row else h - 1 - row   // image coordinate
      val base = offset + row * rowSize
      var x = 0
      while (x < width) {
        val i = base + x * 3                       // padding never read
        val b = payload(i) & 0xff
        sb += b
        sg += payload(i + 1) & 0xff
        sr += payload(i + 2) & 0xff
        if (y < topHalf) sbTop += b
        x += 1
      }
      row += 1
    }
    val n = width.toLong * h
    Some(Decoded(width, h,
      sb.toDouble / n / 255.0,
      sg.toDouble / n / 255.0,
      sr.toDouble / n / 255.0,
      sbTop.toDouble / (width.toLong * topHalf) / 255.0))
  }

  /** Full pixel decode for stages that transform pixels (resize):
    * same validation contract as [[decode]], pixels returned row-major
    * in IMAGE order (y=0 top) packed 0xRRGGBB. Bounded separately from
    * [[decode]] (which never materializes pixels): an image larger
    * than `maxPixels` returns None rather than allocating.
    */
  def decodePixels(payload: Array[Byte],
                   maxPixels: Long = 1L << 26): Option[(Int, Int, Array[Int])] = {
    if (payload == null || payload.length < 54 ||
        payload(0) != 'B'.toByte || payload(1) != 'M'.toByte) return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fileSize = buf.getInt(2)
    val offset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (fileSize != payload.length || hdrSize != 40 || planes != 1 ||
        bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0 ||
        rawHeight == Int.MinValue || offset < 54) return None
    val topDown = rawHeight < 0
    val h = math.abs(rawHeight)
    val rowSizeL = ((width * 3L + 3L) / 4L) * 4L
    if (rowSizeL > Int.MaxValue ||
        offset.toLong + rowSizeL * h > payload.length) return None
    if (width.toLong * h > maxPixels) return None
    val rowSize = rowSizeL.toInt
    val px = new Array[Int](width * h)
    var row = 0
    while (row < h) {
      val y = if (topDown) row else h - 1 - row
      val base = offset + row * rowSize
      var x = 0
      while (x < width) {
        val i = base + x * 3
        px(y * width + x) = ((payload(i + 2) & 0xff) << 16) |
          ((payload(i + 1) & 0xff) << 8) | (payload(i) & 0xff)
        x += 1
      }
      row += 1
    }
    Some((width, h, px))
  }

  /** 8-slot feature vector; every step is plain double arithmetic in a
    * fixed order so the q62 oracle reproduces it bit-for-bit (CAST AS
    * REAL at the same narrowing points).
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
