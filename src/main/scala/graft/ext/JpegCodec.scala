package graft.ext

/** Pure-JVM codec for baseline-DCT JPEG (ITU T.81 SOF0) — the second
  * entropy-coded image decoder behind [[Multimodal]] next to
  * [[GifCodec]], and the deepest: marker parsing, canonical Huffman
  * table construction from DHT, bit-level entropy decode with 0xFF
  * byte-unstuffing, DC difference coding, AC run-length/EOB/ZRL,
  * dequantization, dezigzag, a separable floating-point IDCT, level
  * shift, and (for 3-component images) integer YCbCr→RGB. No
  * libraries — `javax.imageio` is never touched.
  *
  * Scope (strictness contract — arbitrary bytes must not
  * false-positive into the image path): baseline SOF0 only, 8-bit,
  * 1 or 3 components, 4:4:4 (h=v=1), no progressive, no restart
  * intervals, every segment length bounds-checked, the entropy
  * stream must decode to exactly the MCU count the frame declares,
  * and EOI must terminate the stream.
  *
  * The encoder (fixture synthesis) is a REAL entropy coder — FDCT,
  * quantization, category/extend coding, canonical Huffman with
  * byte stuffing — but emits its own fixed canonical tables in
  * DQT/DHT rather than the Annex K defaults: DC categories at 4
  * bits, 255 AC symbols at 9 bits + one at 10 (a DHT length count
  * is one byte; Kraft sum < 1 and the all-ones codeword stays
  * unused, as T.81 requires). Decoders must build tables from DHT
  * anyway, so this exercises the same path real files do.
  * The quant table is all 8s: for BLOCK-CONSTANT grayscale content
  * the DC coefficient is 8·(v−128), quantization is exact, and the
  * roundtrip is BIT-EXACT — which is what lets q90's SQL oracle
  * recompute features from the block formula while the lossy color
  * path is covered by tolerance tests.
  */
object JpegCodec {

  /** Same feature surface as [[PngCodec.Decoded]]/[[GifCodec.Decoded]].
    * Grayscale decodes with meanB == meanG == meanR.
    */
  final case class Decoded(width: Int, height: Int,
                           meanB: Double, meanG: Double, meanR: Double,
                           meanBTop: Double)

  // 8x8 orthonormal DCT basis: C(u)(x) = c_u/2 * cos((2x+1)u*pi/16)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** All-8s quantization: exact for block-constant content (DC =
    * 8·(v−128) divides evenly) and mild everywhere else.
    */
  private val Quant: Array[Int] = Array.fill(64)(8)

  // Fixed canonical tables (emitted in DHT, rebuilt by any decoder):
  // DC: 12 categories at 4 bits; AC: 255 symbols at 9 bits + symbol
  // 0xFF at 10 (a DHT length count is ONE byte, so 256-at-one-length
  // is unrepresentable; 0xFF = run 15/size 15 is never emitted).
  private val DcBits: Array[Int] = { val b = new Array[Int](17); b(4) = 12; b }
  private val DcVals: Array[Int] = Array.tabulate(12)(identity)
  private val AcBits: Array[Int] = {
    val b = new Array[Int](17); b(9) = 255; b(10) = 1; b
  }
  private val AcVals: Array[Int] = Array.tabulate(256)(identity)

  /** (code, length) per symbol from a canonical (BITS, HUFFVAL) spec. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.toMap
  }

  // ---------------------------------------------------------------
  // Encode
  // ---------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      buf = (buf << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((buf >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7f, 8 - n) } // pad with 1s
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** FDCT of one level-shifted 8x8 block (row-major doubles). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    // rows: tmp = f * C^T
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += block(y * 8 + x) * Basis(u)(x); x += 1 }
        tmp(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    // cols: out = C * tmp
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += Basis(v)(yy) * tmp(yy * 8 + u); yy += 1 }
        out(v * 8 + u) = s; u += 1
      }
      v += 1
    }
    out
  }

  /** Encode one quantized block (zigzag ints); returns new DC pred. */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], dcPred: Int,
                          dcCodes: Map[Int, (Int, Int)],
                          acCodes: Map[Int, (Int, Int)]): Int = {
    val diff = zz(0) - dcPred
    val cat = category(diff)
    val (dcode, dlen) = dcCodes(cat)
    bw.put(dcode, dlen)
    if (cat > 0) {
      val bits = if (diff < 0) diff + (1 << cat) - 1 else diff
      bw.put(bits, cat)
    }
    var run = 0
    var k = 1
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run > 15) { val (c, l) = acCodes(0xf0); bw.put(c, l); run -= 16 }
        val size = category(v)
        val (c, l) = acCodes((run << 4) | size)
        bw.put(c, l)
        val bits = if (v < 0) v + (1 << size) - 1 else v
        bw.put(bits, size)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
    zz(0)
  }

  private def u16be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def segment(out: java.io.ByteArrayOutputStream, marker: Int,
                      body: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    u16be(out, body.length + 2)
    body.foreach(out.write)
  }

  /** Core encoder: per-component planes at their OWN resolutions with
    * sampling factors `samp` (MCU-interleaved per T.81; edge blocks
    * replicate the plane's last row/column).
    */
  private def encodeSampled(width: Int, height: Int,
                            samp: Array[(Int, Int)],
                            planeW: Array[Int], planeH: Array[Int],
                            plane: (Int, Int, Int) => Int,
                            restartInterval: Int = 0): Array[Byte] = {
    require(restartInterval >= 0 && restartInterval <= 65535)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val nComp = samp.length
    require(nComp == 1 || nComp == 3)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT: precision 0, table id 0, 64 values in zigzag order
    segment(out, 0xdb, 0 +: Zigzag.map(Quant(_)))
    // SOF0: precision 8, dims, components (id, h<<4|v, quant table)
    segment(out, 0xc0,
      Array(8, (height >> 8) & 0xff, height & 0xff,
        (width >> 8) & 0xff, width & 0xff, nComp) ++
        (0 until nComp).flatMap(c => Seq(c + 1, (samp(c)._1 << 4) | samp(c)._2, 0)))
    // DHT: DC table 0 (class 0) and AC table 0 (class 1)
    segment(out, 0xc4, (0x00 +: DcBits.drop(1)) ++ DcVals)
    segment(out, 0xc4, (0x10 +: AcBits.drop(1)) ++ AcVals)
    if (restartInterval > 0) // DRI: restart every Ri MCUs
      segment(out, 0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    // SOS: every component uses DC table 0 / AC table 0
    segment(out, 0xda,
      Array(nComp) ++ (1 to nComp).flatMap(c => Seq(c, 0x00)) ++ Array(0, 63, 0))

    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val entropy = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(entropy)
    val dcPred = new Array[Int](nComp)
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val block = new Array[Double](64)
    val zz = new Array[Int](64)
    var mcuIdx = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          // byte-align, emit RSTn (bare marker, no stuffing), reset DC
          bw.flush()
          entropy.write(0xff); entropy.write(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nComp) {
          val (sh, sv) = samp(c)
          var iv = 0
          while (iv < sv) {
            var ih = 0
            while (ih < sh) {
              val baseX = (mx * sh + ih) * 8
              val baseY = (my * sv + iv) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val px = math.min(baseX + x, planeW(c) - 1)
                  val py = math.min(baseY + y, planeH(c) - 1)
                  block(y * 8 + x) = plane(c, px, py) - 128.0
                  x += 1
                }
                y += 1
              }
              val f = fdct(block)
              var k = 0
              while (k < 64) {
                zz(k) = math.round(f(Zigzag(k)) / Quant(Zigzag(k))).toInt
                k += 1
              }
              dcPred(c) = encodeBlock(bw, zz, dcPred(c), dcCodes, acCodes)
              ih += 1
            }
            iv += 1
          }
          c += 1
        }
        mcuIdx += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    entropy.toByteArray.foreach(b => out.write(b & 0xff))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode planes(c)(x, y) ∈ 0..255 (1 plane = grayscale, 3 = YCbCr
    * already converted) as a baseline 4:4:4 JPEG.
    */
  private def encodePlanes(width: Int, height: Int,
                           planes: Array[(Int, Int) => Int],
                           restartInterval: Int = 0): Array[Byte] =
    encodeSampled(width, height, Array.fill(planes.length)((1, 1)),
      Array.fill(planes.length)(width), Array.fill(planes.length)(height),
      (c, x, y) => planes(c)(x, y), restartInterval)

  /** Grayscale encode — the bit-exact path for block-constant content. */
  def encodeGray(width: Int, height: Int, gray: (Int, Int) => Int,
                 restartInterval: Int = 0): Array[Byte] =
    encodePlanes(width, height, Array((x, y) => gray(x, y) & 0xff), restartInterval)

  /** RGB encode via the JFIF integer color transform (lossy ±1). */
  def encodeRgb(width: Int, height: Int,
                rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    def yp(x: Int, y: Int): Int = {
      val (r, g, b) = rgb(x, y)
      clamp255(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
    }
    def cb(x: Int, y: Int): Int = {
      val (r, g, b) = rgb(x, y)
      clamp255(math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt)
    }
    def cr(x: Int, y: Int): Int = {
      val (r, g, b) = rgb(x, y)
      clamp255(math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt)
    }
    encodePlanes(width, height, Array(yp, cb, cr))
  }

  /** RGB encode with 4:2:0 chroma subsampling — the layout virtually
    * every camera/web JPEG uses: full-resolution Y, Cb/Cr averaged
    * over each 2×2 pixel quad and stored at half resolution, MCUs
    * interleaved as 4 Y blocks + 1 Cb + 1 Cr.
    */
  def encodeRgb420(width: Int, height: Int,
                   rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val cw = (width + 1) / 2; val ch = (height + 1) / 2
    def ycc(x: Int, y: Int): (Double, Double, Double) = {
      val (r, g, b) = rgb(x, y)
      (0.299 * r + 0.587 * g + 0.114 * b,
       128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
       128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    }
    def avgChroma(sel: ((Double, Double, Double)) => Double)(cx: Int, cy: Int): Int = {
      var s = 0.0; var n = 0
      var dy = 0
      while (dy < 2) {
        var dx = 0
        while (dx < 2) {
          val px = cx * 2 + dx; val py = cy * 2 + dy
          if (px < width && py < height) { s += sel(ycc(px, py)); n += 1 }
          dx += 1
        }
        dy += 1
      }
      clamp255(math.round(s / n).toInt)
    }
    encodeSampled(width, height,
      Array((2, 2), (1, 1), (1, 1)),
      Array(width, cw, cw), Array(height, ch, ch),
      (c, x, y) => c match {
        case 0 => clamp255(math.round(ycc(x, y)._1).toInt)
        case 1 => avgChroma(_._2)(x, y)
        case _ => avgChroma(_._3)(x, y)
      })
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // minCode/maxCode/valPtr per length — T.81 F.16 decode procedure
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len); k += bits(len)
        maxCode(len) = if (bits(len) > 0) code - 1 else -1
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + (code - minCode(len)))
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var n = 0
    var bad = false
    def bit(): Int = {
      if (n == 0) {
        if (pos >= data.length) { bad = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) { bad = true; return 0 }
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1      // stuffed byte
          else { bad = true; return 0 } // a marker inside entropy data
        }
        buf = b; n = 8
      }
      n -= 1
      (buf >> n) & 1
    }
    def bits(count: Int): Int = {
      var v = 0; var i = 0
      while (i < count) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = { buf = 0; n = 0 } // drop intra-byte padding
    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      if (len > 16 || bad) { bad = true; return -1 }
      t.value(len, code)
    }
  }

  private def extend(bits: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (bits < (1 << (cat - 1))) bits - (1 << cat) + 1
    else bits

  /** None unless the payload is a structurally valid baseline 4:4:4
    * JPEG per the scope contract above.
    */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    if (payload == null || payload.length < 4) return None
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    def u8(p: Int): Int = payload(p) & 0xff
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)

    var width = 0; var height = 0; var nComp = 0
    val quant = scala.collection.mutable.Map[Int, Array[Int]]()
    val huffDc = scala.collection.mutable.Map[Int, HuffTable]()
    val huffAc = scala.collection.mutable.Map[Int, HuffTable]()
    var compQuant: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var sofSeen = false
    var restartInterval = 0
    var scanStart = -1

    while (scanStart < 0) {
      if (pos + 4 > payload.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8 || marker == 0xd9) return None // stray SOI / early EOI
      val len = u16(pos + 2)
      if (len < 2 || pos + 2 + len > payload.length) return None
      val body = pos + 4
      val bodyLen = len - 2
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = body
          while (p < body + bodyLen) {
            val pq = u8(p) >> 4; val tq = u8(p) & 0x0f
            if (pq != 0) return None // 8-bit tables only
            if (p + 65 > body + bodyLen) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = u8(p + 1 + k); k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = body
          while (p < body + bodyLen) {
            val tc = u8(p) >> 4; val th = u8(p) & 0x0f
            if (p + 17 > body + bodyLen) return None
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(p + l); total += bits(l); l += 1 }
            if (p + 17 + total > body + bodyLen || total > 256) return None
            val vals = Array.tabulate(total)(i => u8(p + 17 + i))
            val t = new HuffTable(bits, vals)
            if (tc == 0) huffDc(th) = t
            else if (tc == 1) huffAc(th) = t
            else return None
            p += 17 + total
          }
        case 0xc0 => // SOF0 baseline
          if (sofSeen || bodyLen < 6) return None
          sofSeen = true
          if (u8(body) != 8) return None // 8-bit precision
          height = u16(body + 1); width = u16(body + 3)
          nComp = u8(body + 5)
          if (width <= 0 || height <= 0) return None
          if (nComp != 1 && nComp != 3) return None
          if (bodyLen != 6 + 3 * nComp) return None
          compQuant = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            val hv = u8(body + 7 + 3 * c)
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            compQuant(c) = u8(body + 8 + 3 * c)
            c += 1
          }
          // 4:4:4 (all 1x1) or 4:2:0 (luma 2x2, chroma 1x1) only
          val is444 = compH.forall(_ == 1) && compV.forall(_ == 1)
          val is420 = nComp == 3 && compH(0) == 2 && compV(0) == 2 &&
            compH(1) == 1 && compV(1) == 1 && compH(2) == 1 && compV(2) == 1
          if (!is444 && !is420) return None
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 =>
          // progressive / arithmetic / hierarchical SOFn, and the
          // reserved JPG marker 0xC8 — nothing but SOF0 may reach
          // the baseline path
          return None
        case 0xdd => // DRI: restart interval in MCUs
          if (bodyLen != 2) return None
          restartInterval = u16(body)
        case 0xda => // SOS
          if (!sofSeen || bodyLen < 1 + 2 * 1 + 3) return None
          val ns = u8(body)
          if (ns != nComp || bodyLen != 1 + 2 * ns + 3) return None
          compDc = new Array[Int](nComp)
          compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val tables = u8(body + 2 + 2 * c)
            compDc(c) = tables >> 4; compAc(c) = tables & 0x0f
            c += 1
          }
          // Ss=0, Se=63 (full spectral), Ah=Al=0 (no successive
          // approximation) — anything else is a progressive scan
          // header and must not false-positive into baseline decode
          if (u8(body + 1 + 2 * ns) != 0 || u8(body + 2 + 2 * ns) != 63) return None
          if (u8(body + 3 + 2 * ns) != 0) return None
          scanStart = pos + 2 + len
        case _ => () // APPn / COM / others: skip
      }
      if (scanStart < 0) pos = pos + 2 + len
    }

    // components must reference declared tables
    var c = 0
    while (c < nComp) {
      if (!quant.contains(compQuant(c)) || !huffDc.contains(compDc(c)) ||
          !huffAc.contains(compAc(c))) return None
      c += 1
    }

    val totalL = width.toLong * height
    if (totalL > Int.MaxValue / 4) return None
    val hMax = compH.max; val vMax = compV.max
    // per-component plane dims: ceil(width * h / Hmax) etc.
    val planeW = Array.tabulate(nComp)(c => (width * compH(c) + hMax - 1) / hMax)
    val planeH = Array.tabulate(nComp)(c => (height * compV(c) + vMax - 1) / vMax)
    val planes = Array.tabulate(nComp)(c => new Array[Int](planeW(c) * planeH(c)))
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val br = new BitReader(payload, scanStart)
    val dcPred = new Array[Int](nComp)
    val zz = new Array[Int](64)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)

    var mcuIdx = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          // byte-align (discard 1-padding), consume the expected RSTn
          // (cycling index per T.81), reset DC predictors
          br.align()
          if (br.pos + 2 > payload.length) return None
          if ((payload(br.pos) & 0xff) != 0xff ||
              (payload(br.pos + 1) & 0xff) != 0xd0 + rstN) return None
          br.pos += 2
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < nComp) {
          val q = quant(compQuant(ci))
          val dct = huffDc(compDc(ci)); val act = huffAc(compAc(ci))
          val pw = planeW(ci); val ph = planeH(ci)
          var iv = 0
          while (iv < compV(ci)) {
            var ih = 0
            while (ih < compH(ci)) {
              java.util.Arrays.fill(zz, 0)
              val cat = br.decode(dct)
              if (br.bad || cat < 0 || cat > 11) return None
              dcPred(ci) += extend(br.bits(cat), cat)
              zz(0) = dcPred(ci)
              var k = 1
              while (k < 64) {
                val rs = br.decode(act)
                if (br.bad || rs < 0) return None
                val run = rs >> 4; val size = rs & 0x0f
                if (size == 0) {
                  if (rs == 0x00) k = 64            // EOB
                  else if (rs == 0xf0) k += 16      // ZRL
                  else return None
                } else {
                  k += run
                  if (k > 63) return None
                  zz(k) = extend(br.bits(size), size)
                  k += 1
                }
              }
              if (br.bad) return None
              // dequant + dezigzag
              var i = 0
              while (i < 64) { coef(Zigzag(i)) = zz(i).toDouble * q(Zigzag(i)); i += 1 }
              // IDCT: f = C^T * F * C  (separable)
              var yy = 0
              while (yy < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0; var u = 0
                  while (u < 8) { s += Basis(u)(x) * coef(yy * 8 + u); u += 1 }
                  tmp(yy * 8 + x) = s; x += 1
                }
                yy += 1
              }
              val baseX = (mx * compH(ci) + ih) * 8
              val baseY = (my * compV(ci) + iv) * 8
              var y2 = 0
              while (y2 < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0; var v = 0
                  while (v < 8) { s += Basis(v)(y2) * tmp(v * 8 + x); v += 1 }
                  val px = baseX + x; val py = baseY + y2
                  if (px < pw && py < ph)
                    planes(ci)(py * pw + px) =
                      clamp255(math.round(s + 128.0).toInt)
                  x += 1
                }
                y2 += 1
              }
              ih += 1
            }
            iv += 1
          }
          ci += 1
        }
        mcuIdx += 1
        mx += 1
      }
      my += 1
    }
    // entropy data must be followed (after 1-bit padding) by EOI
    var p = br.pos
    if (p + 2 > payload.length) return None
    if (u8(p) != 0xff || u8(p + 1) != 0xd9) return None
    if (p + 2 != payload.length) return None

    // means; chroma read at its own resolution (nearest-neighbor
    // upsample: for 4:2:0 pixel (x, y) samples chroma (x/2, y/2))
    var sr = 0L; var sg = 0L; var sb = 0L; var sbTop = 0L
    val topRows = (height + 1) / 2
    var yP = 0
    while (yP < height) {
      var xP = 0
      while (xP < width) {
        val (r, g, b) =
          if (nComp == 1) { val v = planes(0)(yP * planeW(0) + xP); (v, v, v) }
          else {
            val yv = planes(0)(yP * planeW(0) + xP)
            val cbx = xP * compH(1) / hMax; val cby = yP * compV(1) / vMax
            val crx = xP * compH(2) / hMax; val cry = yP * compV(2) / vMax
            val cbv = planes(1)(cby * planeW(1) + cbx) - 128
            val crv = planes(2)(cry * planeW(2) + crx) - 128
            (clamp255(math.round(yv + 1.402 * crv).toInt),
             clamp255(math.round(yv - 0.344136 * cbv - 0.714136 * crv).toInt),
             clamp255(math.round(yv + 1.772 * cbv).toInt))
          }
        sr += r; sg += g; sb += b
        if (yP < topRows) sbTop += b
        xP += 1
      }
      yP += 1
    }
    val nd = (width.toLong * height).toDouble
    Some(Decoded(width, height, sb / nd / 255.0, sg / nd / 255.0, sr / nd / 255.0,
      sbTop.toDouble / (width.toLong * topRows) / 255.0))
  }

  /** Identical 8-slot formula to the other codecs. */
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
