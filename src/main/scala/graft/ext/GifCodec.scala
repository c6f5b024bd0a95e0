package graft.ext

/** Pure-JVM codec for palette-based, non-interlaced GIF (87a/89a) —
  * the first ENTROPY-CODED image decoder behind [[Multimodal]], next
  * to the fixed-layout [[BmpCodec]]/[[PngCodec]] pair. No libraries
  * at all: the variable-width LZW decompressor (code widths 3..12,
  * clear/EOI codes, the KwKwK self-reference case, dictionary reset
  * at 4096) is implemented here from the GIF specification.
  *
  * Strictness contract (same as the other codecs — arbitrary bytes
  * must not false-positive into the image path): signature, one
  * image covering the full logical screen at origin, global color
  * table required, no local table, no interlace, LZW min-code-size
  * in range, every sub-block bounds-checked, the index stream must
  * decode to EXACTLY width·height pixels with every index inside
  * the declared palette, and the trailer must be present.
  *
  * Unlike PNG's stored-block encode, the payload size here is NOT a
  * closed-form function of the dimensions — that is the point: the
  * bytes on the hot path went through real entropy coding (q87's
  * oracle therefore checks pixel-derived features, not `n_bytes`).
  */
object GifCodec {

  /** Same feature surface as [[PngCodec.Decoded]]: channel means in
    * [0,1] and the top-half blue mean (rows y < ⌈h/2⌉ — GIF rows are
    * top-down; catches an inverted-row decoder).
    */
  final case class Decoded(width: Int, height: Int,
                           meanB: Double, meanG: Double, meanR: Double,
                           meanBTop: Double)

  // ---------------------------------------------------------------
  // Encode (fixture synthesis): indexed image + palette -> GIF87a
  // ---------------------------------------------------------------

  /** Encode an indexed image as GIF87a with a REAL LZW compressor —
    * `palette` (2..256 colors, padded to the next power of two) and
    * `index(x, y)` (y=0 is the TOP row) must satisfy
    * `0 <= index < palette.length`.
    */
  def encode(width: Int, height: Int, palette: Array[(Int, Int, Int)],
             index: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(palette.length >= 2 && palette.length <= 256,
      s"palette size ${palette.length} outside 2..256")
    // k: table-size exponent; GCT holds 2^(k+1) entries
    var k = 0
    while ((2 << k) < palette.length) k += 1
    val gctEntries = 2 << k
    val minCode = math.max(2, k + 1)

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | (7 << 4) | k) // GCT present, max color resolution
    out.write(0); out.write(0)     // background index, aspect
    var i = 0
    while (i < gctEntries) {
      val (r, g, b) = if (i < palette.length) palette(i) else (0, 0, 0)
      out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
      i += 1
    }
    out.write(0x2c)                // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)                   // no LCT, no interlace
    out.write(minCode)

    // --- LZW compress the row-major index stream ---
    val clear = 1 << minCode
    val eoi = clear + 1
    val codes = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitLen = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitLen
      bitLen += codeSize
      while (bitLen >= 8) {
        codes.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitLen -= 8
      }
    }
    // dict key: prefixCode * 256 + nextIndex (both bounded: <4096, <256)
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    var w = index(0, 0)
    require(w >= 0 && w < palette.length, s"index $w out of palette")
    var p = 1
    val total = width * height
    while (p < total) {
      val c = index(p % width, p / width)
      require(c >= 0 && c < palette.length, s"index $c out of palette")
      val key = Integer.valueOf(w * 256 + c)
      val hit = dict.get(key)
      if (hit != null) w = hit.intValue()
      else {
        emit(w)
        if (next == 4096) { // dictionary full: reset, decoder mirrors
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = eoi + 1
          codeSize = minCode + 1
        } else {
          dict.put(key, Integer.valueOf(next)); next += 1
          // decoder lags one entry, hence the +1 alignment
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        }
        w = c
      }
      p += 1
    }
    emit(w); emit(eoi)
    if (bitLen > 0) codes.write((bitBuf & 0xff).toInt)

    val data = codes.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  /** None unless the payload is a structurally valid palette GIF per
    * the strictness contract above.
    */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    if (payload == null || payload.length < 6 + 7 + 6 + 1 + 2) return None
    val sig = new String(payload, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(p: Int): Int = payload(p) & 0xff
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    val width = u16(6); val height = u16(8)
    val packed = u8(10)
    if ((packed & 0x80) == 0) return None // global color table required
    val gctEntries = 2 << (packed & 0x07)
    var pos = 13
    if (pos + 3 * gctEntries > payload.length) return None
    val palR = new Array[Int](gctEntries)
    val palG = new Array[Int](gctEntries)
    val palB = new Array[Int](gctEntries)
    var ci = 0
    while (ci < gctEntries) {
      palR(ci) = u8(pos); palG(ci) = u8(pos + 1); palB(ci) = u8(pos + 2)
      pos += 3; ci += 1
    }
    // total pixels in Long first: u16 dims cap at 65535² = 4.3e9 > Int
    val totalL = width.toLong * height
    if (width <= 0 || height <= 0 || totalL > Int.MaxValue) return None
    val total = totalL.toInt

    // walk blocks: extensions skipped, exactly one image, then trailer
    var imageSeen = false
    var trailerSeen = false
    val lzw = new java.io.ByteArrayOutputStream()
    var minCode = -1
    while (!trailerSeen) {
      if (pos >= payload.length) return None
      u8(pos) match {
        case 0x3b =>
          trailerSeen = true; pos += 1
        case 0x21 => // extension: label byte + sub-blocks
          pos += 2
          var len = if (pos < payload.length) u8(pos) else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= payload.length) return None
            len = u8(pos)
          }
          pos += 1
        case 0x2c =>
          if (imageSeen) return None // single-image contract
          imageSeen = true
          if (pos + 10 > payload.length) return None
          if (u16(pos + 1) != 0 || u16(pos + 3) != 0 ||
              u16(pos + 5) != width || u16(pos + 7) != height) return None
          val ipacked = u8(pos + 9)
          if ((ipacked & 0x80) != 0) return None // no local color table
          if ((ipacked & 0x40) != 0) return None // no interlace
          pos += 10
          if (pos >= payload.length) return None
          minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          var len = if (pos < payload.length) u8(pos) else return None
          while (len != 0) {
            if (pos + 1 + len > payload.length) return None
            lzw.write(payload, pos + 1, len)
            pos += 1 + len
            len = if (pos < payload.length) u8(pos) else return None
          }
          pos += 1
        case _ => return None
      }
    }
    if (!imageSeen || pos != payload.length) return None

    decodeLzw(lzw.toByteArray, minCode, total, gctEntries).map { idx =>
      var sb = 0L; var sg = 0L; var sr = 0L; var sbTop = 0L
      var p = 0
      val topRows = (height + 1) / 2
      while (p < total) {
        val c = idx(p)
        sb += palB(c); sg += palG(c); sr += palR(c)
        if (p / width < topRows) sbTop += palB(c)
        p += 1
      }
      val n = total.toDouble
      Decoded(width, height, sb / n / 255.0, sg / n / 255.0, sr / n / 255.0,
        sbTop.toDouble / (width.toLong * topRows) / 255.0)
    }
  }

  /** GIF-LZW decompress to exactly `expected` indices, every one
    * `< maxIndex`; None on any stream malformation. Dictionary as
    * flat parallel arrays (prefix code + appended byte per entry) —
    * strings materialize only while emitting, via [[emitCode]].
    */
  private def decodeLzw(data: Array[Byte], minCode: Int,
                        expected: Int, maxIndex: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    val out = new Array[Int](expected)
    var outLen = 0
    var codeSize = minCode + 1
    var nextCode = eoi + 1
    var prev = -1
    var bitPos = 0L
    val bitEnd = data.length.toLong * 8

    def readCode(): Int = {
      if (bitPos + codeSize > bitEnd) return -1
      var v = 0; var got = 0
      while (got < codeSize) {
        val byte = data((bitPos >> 3).toInt) & 0xff
        val bitOff = (bitPos & 7).toInt
        val take = math.min(8 - bitOff, codeSize - got)
        v |= ((byte >> bitOff) & ((1 << take) - 1)) << got
        got += take; bitPos += take
      }
      v
    }

    // write the string for `code` into out; returns its first index
    // (needed for the new dictionary entry), or -1 on overflow/corrupt
    def emitCode(code: Int): Int = {
      var len = 0
      var c = code
      while (c >= eoi + 1) { len += 1; c = prefix(c) } // root is a literal
      len += 1
      if (outLen + len > expected) return -1
      var w = outLen + len - 1
      c = code
      while (c >= eoi + 1) { out(w) = append(c); w -= 1; c = prefix(c) }
      if (c >= maxIndex || c == clear || c == eoi) return -1
      out(w) = c
      outLen += len
      out(outLen - len)
    }

    var done = false
    while (!done) {
      val code = readCode()
      if (code < 0) return None
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear || code >= maxIndex) return None // first must be literal
        if (outLen + 1 > expected) return None
        out(outLen) = code; outLen += 1
        prev = code
      } else {
        if (code > nextCode) return None // references a never-assigned entry
        if (code == nextCode) {
          // KwKwK: string = prev's string + that string's first index
          if (nextCode >= 4096) return None
          val prevFirst = firstIndex(prev, eoi, prefix, maxIndex)
          if (prevFirst < 0) return None
          prefix(nextCode) = prev; append(nextCode) = prevFirst
          if (emitCode(code) < 0) return None
          nextCode += 1
        } else {
          val first = emitCode(code)
          if (first < 0) return None
          if (nextCode < 4096) {
            prefix(nextCode) = prev; append(nextCode) = first
            nextCode += 1
          }
        }
        if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    if (outLen == expected) Some(out) else None
  }

  /** First (root) index of the string behind `code`; -1 if corrupt. */
  private def firstIndex(code: Int, eoi: Int, prefix: Array[Int],
                         maxIndex: Int): Int = {
    var c = code
    while (c >= eoi + 1) c = prefix(c)
    if (c >= maxIndex) -1 else c
  }

  /** Identical 8-slot formula to [[BmpCodec.features]]/
    * [[PngCodec.features]] — features are codec-independent.
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
