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

  /** One composited animation frame: the full logical-screen canvas
    * AFTER this frame was drawn (what a player displays), plus the
    * frame's GCE delay. `canvas.width/height` are the logical screen
    * dims — constant across frames.
    */
  final case class FrameDecoded(frameIdx: Int, delayCs: Int, canvas: Decoded)

  /** Animation-frame spec for [[encodeAnimated]]: a sub-rectangle at
    * (left, top) sized w×h, drawn with `index(fx, fy)` over
    * FRAME-LOCAL coordinates. `transparentIdx` = -1 for opaque;
    * `disposal` ∈ {0 none, 1 leave, 2 restore-background}.
    * `localPalette` overrides the global table for this frame only.
    */
  final case class AnimFrame(left: Int, top: Int, w: Int, h: Int,
                             delayCs: Int = 0, disposal: Int = 1,
                             transparentIdx: Int = -1,
                             localPalette: Option[Array[(Int, Int, Int)]] = None,
                             index: (Int, Int) => Int)

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
    writeSubBlocks(out,
      compressLzw(minCode, width * height, palette.length,
        p => index(p % width, p / width)))
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** LZW-compress `total` indices (row-major via `idxAt`) into the
    * raw code-byte stream (caller sub-blocks it). Variable-width
    * codes, clear/EOI, dictionary reset at 4096 — the exact scheme
    * [[decodeLzw]] mirrors.
    */
  private def compressLzw(minCode: Int, total: Int, nColors: Int,
                          idxAt: Int => Int): Array[Byte] = {
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
    var w = idxAt(0)
    require(w >= 0 && w < nColors, s"index $w out of palette")
    var p = 1
    while (p < total) {
      val c = idxAt(p)
      require(c >= 0 && c < nColors, s"index $c out of palette")
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
    codes.toByteArray
  }

  private def writeSubBlocks(out: java.io.ByteArrayOutputStream,
                             data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n)
      off += n
    }
  }

  /** Encode a multi-frame GIF89a animation: global color table,
    * NETSCAPE looping extension, and per frame a Graphic Control
    * Extension (delay/disposal/transparency) + image descriptor
    * (sub-rectangle, optional local color table) + real LZW data.
    * Frames composite onto the logical screen in order, so partial
    * frames and transparency exercise the player-side compositing
    * that [[decodeAnimated]] implements.
    */
  def encodeAnimated(width: Int, height: Int,
                     palette: Array[(Int, Int, Int)],
                     frames: Seq[AnimFrame],
                     backgroundIdx: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(palette.length >= 2 && palette.length <= 256,
      s"palette size ${palette.length} outside 2..256")
    require(frames.nonEmpty, "at least one frame")
    require(backgroundIdx >= 0 && backgroundIdx < palette.length,
      s"background index $backgroundIdx outside palette")
    var k = 0
    while ((2 << k) < palette.length) k += 1
    val gctEntries = 2 << k

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | (7 << 4) | k)
    out.write(backgroundIdx); out.write(0)
    var i = 0
    while (i < gctEntries) {
      val (r, g, b) = if (i < palette.length) palette(i) else (0, 0, 0)
      out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
      i += 1
    }
    // NETSCAPE2.0 looping application extension (loop forever)
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(0); out.write(0)

    frames.foreach { f =>
      val pal = f.localPalette.getOrElse(palette)
      require(pal.length >= 2 && pal.length <= 256,
        s"local palette size ${pal.length} outside 2..256")
      require(f.w > 0 && f.h > 0 && f.left >= 0 && f.top >= 0 &&
        f.left + f.w <= width && f.top + f.h <= height,
        s"frame rect (${f.left},${f.top} ${f.w}x${f.h}) outside ${width}x$height")
      require(f.disposal >= 0 && f.disposal <= 2, s"disposal ${f.disposal}")
      require(f.transparentIdx < pal.length,
        s"transparent index ${f.transparentIdx} outside palette")
      // GCE
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      u16(f.delayCs)
      out.write(math.max(0, f.transparentIdx))
      out.write(0)
      // image descriptor
      var lk = 0
      while ((2 << lk) < pal.length) lk += 1
      val lctEntries = 2 << lk
      out.write(0x2c)
      u16(f.left); u16(f.top); u16(f.w); u16(f.h)
      if (f.localPalette.isDefined) {
        out.write(0x80 | lk)
        var j = 0
        while (j < lctEntries) {
          val (r, g, b) = if (j < pal.length) pal(j) else (0, 0, 0)
          out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
          j += 1
        }
      } else out.write(0)
      val minCode = math.max(2, lk + 1)
      out.write(minCode)
      writeSubBlocks(out,
        compressLzw(minCode, f.w * f.h, pal.length,
          p => {
            val v = f.index(p % f.w, p / f.w)
            require(v >= 0 && v < pal.length, s"index $v out of palette")
            v
          }))
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  /** None unless the payload is a structurally valid palette GIF per
    * the strictness contract above.
    */
  def decode(payload: Array[Byte]): Option[Decoded] =
    parseSingle(payload).map { case (width, height, palR, palG, palB, idx) =>
      val total = width * height
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

  /** Full pixel decode for pixel-transforming stages (resize): the
    * single-image contract of [[decode]], palette-resolved to packed
    * 0xRRGGBB rows in image order.
    */
  def decodePixels(payload: Array[Byte],
                   maxPixels: Long = 1L << 26): Option[(Int, Int, Array[Int])] =
    parseSingle(payload).flatMap { case (width, height, palR, palG, palB, idx) =>
      if (width.toLong * height > maxPixels) None
      else {
        val px = new Array[Int](width * height)
        var p = 0
        while (p < px.length) {
          val c = idx(p)
          px(p) = (palR(c) << 16) | (palG(c) << 8) | palB(c)
          p += 1
        }
        Some((width, height, px))
      }
    }

  /** Parse + LZW-decode a SINGLE-image GIF (the [[decode]] strictness
    * contract) to its palette channels and index stream.
    */
  private def parseSingle(payload: Array[Byte])
      : Option[(Int, Int, Array[Int], Array[Int], Array[Int], Array[Int])] = {
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

    decodeLzw(lzw.toByteArray, minCode, total, gctEntries)
      .map(idx => (width, height, palR, palG, palB, idx))
  }

  /** Decode EVERY frame of a (possibly animated) GIF with real
    * player-side compositing: a logical-screen canvas initialized to
    * the background color, each frame's sub-rectangle LZW-decoded
    * with its active (local-or-global) palette and drawn over the
    * canvas honoring the Graphic Control Extension's transparency
    * index, the post-frame state emitted as that frame's composite,
    * then disposal applied (0/1 leave, 2 restore-background in the
    * frame rect; 3 "restore previous" is rejected — out of the
    * strictness contract, like interlace).
    *
    * Strictness: global color table + in-range background index
    * required, every frame rect inside the logical screen, LZW
    * min-code-size 2..8, every stream must decode to exactly
    * rect-w·rect-h in-palette indices, at least one frame, trailer
    * present and final. A single-image GIF yields one frame whose
    * composite equals [[decode]]'s result when the image covers the
    * screen.
    */
  def decodeAnimated(payload: Array[Byte]): Option[Vector[FrameDecoded]] = {
    if (payload == null || payload.length < 6 + 7 + 6 + 1 + 2) return None
    val sig = new String(payload, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(p: Int): Int = payload(p) & 0xff
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    val width = u16(6); val height = u16(8)
    val packed = u8(10)
    if ((packed & 0x80) == 0) return None // global color table required
    val gctEntries = 2 << (packed & 0x07)
    val bgIdx = u8(11)
    if (bgIdx >= gctEntries) return None
    var pos = 13
    if (pos + 3 * gctEntries > payload.length) return None
    val gct = new Array[Int](3 * gctEntries)
    var ci = 0
    while (ci < 3 * gctEntries) { gct(ci) = u8(pos); pos += 1; ci += 1 }
    val totalL = width.toLong * height
    if (width <= 0 || height <= 0 || totalL > Int.MaxValue) return None
    val total = totalL.toInt

    // canvas as palette-RESOLVED channels (palettes can switch per
    // frame, so indices alone can't represent composited state)
    val canR = new Array[Int](total)
    val canG = new Array[Int](total)
    val canB = new Array[Int](total)
    def fillRect(l: Int, t: Int, w: Int, h: Int, r: Int, g: Int, b: Int): Unit = {
      var y = t
      while (y < t + h) {
        var x = l; val row = y * width
        while (x < l + w) { canR(row + x) = r; canG(row + x) = g; canB(row + x) = b; x += 1 }
        y += 1
      }
    }
    fillRect(0, 0, width, height,
      gct(3 * bgIdx), gct(3 * bgIdx + 1), gct(3 * bgIdx + 2))

    val frames = Vector.newBuilder[FrameDecoded]
    var nFrames = 0
    // pending GCE state (one per following image, spec 23)
    var gcePending = false
    var gceDelay = 0; var gceTransparent = -1; var gceDisposal = 0
    var trailerSeen = false
    while (!trailerSeen) {
      if (pos >= payload.length) return None
      u8(pos) match {
        case 0x3b =>
          trailerSeen = true; pos += 1
        case 0x21 =>
          if (pos + 1 >= payload.length) return None
          val label = u8(pos + 1)
          if (label == 0xf9) { // Graphic Control Extension
            if (gcePending) return None // two GCEs before an image
            if (pos + 7 >= payload.length || u8(pos + 2) != 4) return None
            val gp = u8(pos + 3)
            gceDisposal = (gp >> 2) & 0x7
            if (gceDisposal > 2) return None // restore-previous: rejected
            gceDelay = u16(pos + 4)
            gceTransparent = if ((gp & 1) != 0) u8(pos + 6) else -1
            if (u8(pos + 7) != 0) return None // terminator
            gcePending = true
            pos += 8
          } else { // any other extension: skip sub-blocks
            pos += 2
            var len = if (pos < payload.length) u8(pos) else return None
            while (len != 0) {
              pos += 1 + len
              if (pos >= payload.length) return None
              len = u8(pos)
            }
            pos += 1
          }
        case 0x2c =>
          if (pos + 10 > payload.length) return None
          val fl = u16(pos + 1); val ft = u16(pos + 3)
          val fw = u16(pos + 5); val fh = u16(pos + 7)
          if (fw == 0 || fh == 0 || fl + fw > width || ft + fh > height) return None
          val ipacked = u8(pos + 9)
          if ((ipacked & 0x40) != 0) return None // no interlace
          pos += 10
          // active palette: local table if present, else global
          var pal = gct; var palEntries = gctEntries
          if ((ipacked & 0x80) != 0) {
            val lctEntries = 2 << (ipacked & 0x07)
            if (pos + 3 * lctEntries > payload.length) return None
            val lct = new Array[Int](3 * lctEntries)
            var li = 0
            while (li < 3 * lctEntries) { lct(li) = u8(pos); pos += 1; li += 1 }
            pal = lct; palEntries = lctEntries
          }
          if (pos >= payload.length) return None
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          val lzw = new java.io.ByteArrayOutputStream()
          var len = if (pos < payload.length) u8(pos) else return None
          while (len != 0) {
            if (pos + 1 + len > payload.length) return None
            lzw.write(payload, pos + 1, len)
            pos += 1 + len
            len = if (pos < payload.length) u8(pos) else return None
          }
          pos += 1
          val transparent = if (gcePending) gceTransparent else -1
          if (transparent >= palEntries) return None
          val idx = decodeLzw(lzw.toByteArray, minCode, fw * fh, palEntries)
            .getOrElse(return None)
          // composite the sub-rectangle (transparent pixels keep canvas)
          var fy = 0
          while (fy < fh) {
            var fx = 0; val row = (ft + fy) * width + fl; val frow = fy * fw
            while (fx < fw) {
              val c = idx(frow + fx)
              if (c != transparent) {
                canR(row + fx) = pal(3 * c)
                canG(row + fx) = pal(3 * c + 1)
                canB(row + fx) = pal(3 * c + 2)
              }
              fx += 1
            }
            fy += 1
          }
          // emit the post-frame composite
          var sb = 0L; var sg = 0L; var sr = 0L; var sbTop = 0L
          val topRows = (height + 1) / 2
          var p = 0
          while (p < total) {
            sb += canB(p); sg += canG(p); sr += canR(p)
            if (p / width < topRows) sbTop += canB(p)
            p += 1
          }
          val n = total.toDouble
          frames += FrameDecoded(nFrames, if (gcePending) gceDelay else 0,
            Decoded(width, height, sb / n / 255.0, sg / n / 255.0, sr / n / 255.0,
              sbTop.toDouble / (width.toLong * topRows) / 255.0))
          nFrames += 1
          // disposal AFTER the composite is shown
          if (gcePending && gceDisposal == 2)
            fillRect(fl, ft, fw, fh,
              gct(3 * bgIdx), gct(3 * bgIdx + 1), gct(3 * bgIdx + 2))
          gcePending = false; gceDelay = 0; gceTransparent = -1; gceDisposal = 0
        case _ => return None
      }
    }
    if (nFrames == 0 || pos != payload.length) return None
    Some(frames.result())
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
