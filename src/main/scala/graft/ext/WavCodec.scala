package graft.ext

/** Pure-JVM codec for RIFF/WAVE with 16-bit integer PCM (the format's
  * trivial core: RIFF header, `fmt ` chunk with audioFormat=1, `data`
  * chunk of little-endian interleaved frames). No native libraries —
  * the second REAL media decoder behind [[Multimodal]] (audio kind),
  * alongside [[BmpCodec]] (image).
  *
  * Correctness surface: q63 synthesizes valid WAVs from a per-doc
  * sample formula and the DuckDB oracle recomputes the expected
  * features from the formula alone — so the chunk walk, channel
  * de-interleaving (per-channel means), sample decoding (signed LE16)
  * and size math (n_bytes) are all hash-checked.
  */
object WavCodec {

  /** Raw sample units (full scale ±32768). `meanCh1` is 0 for mono —
    * the per-channel means are the feature that catches an interleaving
    * bug (a decoder reading frames channel-major would swap/mix them).
    */
  final case class Decoded(channels: Int, sampleRate: Int, frames: Int,
                           meanCh0: Double, meanCh1: Double,
                           meanAbs: Double, peak: Int)

  /** Encode `sample(frame, channel)` (signed 16-bit range) as a
    * canonical 44-byte-header WAV.
    */
  def encode(channels: Int, sampleRate: Int, frames: Int,
             sample: (Int, Int) => Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && frames > 0)
    val dataSize = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                       // PCM fmt chunk size
    buf.putShort(1)                      // audioFormat = PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        buf.putShort(sample(i, c).toShort)
        c += 1
      }
      i += 1
    }
    buf.array()
  }

  private def tag(payload: Array[Byte], at: Int): String =
    new String(payload, at, 4, "US-ASCII")

  /** None unless the payload is a structurally valid 16-bit PCM WAV
    * (RIFF/WAVE magic, declared RIFF size == payload length, PCM fmt
    * chunk, data chunk in bounds, whole frames) — strict enough that
    * arbitrary bytes cannot false-positive into the audio path.
    */
  def decode(payload: Array[Byte]): Option[Decoded] = parsePcm(payload).map {
    case (channels, sampleRate, dataOff, frames) =>
      val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var s0 = 0L; var s1 = 0L; var sAbs = 0L; var peak = 0
      var i = 0
      while (i < frames) {
        var c = 0
        while (c < channels) {
          val v = buf.getShort(dataOff + (i * channels + c) * 2).toInt
          if (c == 0) s0 += v
          if (c == 1) s1 += v
          val a = math.abs(v)
          sAbs += a
          if (a > peak) peak = a
          c += 1
        }
        i += 1
      }
      Decoded(channels, sampleRate, frames,
        s0.toDouble / frames,
        if (channels > 1) s1.toDouble / frames else 0.0,
        sAbs.toDouble / (frames.toLong * channels),
        peak)
  }

  /** Full sample decode for sample-transforming stages (audio
    * fingerprinting): same validation contract as [[decode]], samples
    * returned interleaved (frame-major). Bounded by `maxFrames` so a
    * crafted header cannot force a huge allocation.
    */
  def decodeSamples(payload: Array[Byte],
                    maxFrames: Int = 1 << 24): Option[(Int, Int, Array[Int])] =
    parsePcm(payload).flatMap { case (channels, sampleRate, dataOff, frames) =>
      if (frames > maxFrames) None
      else {
        val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Int](frames * channels)
        var i = 0
        while (i < out.length) {
          out(i) = buf.getShort(dataOff + i * 2).toInt
          i += 1
        }
        Some((channels, sampleRate, out))
      }
    }

  /** Shared strict PCM parse: (channels, sampleRate, dataOff, frames). */
  private def parsePcm(payload: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (payload == null || payload.length < 44 ||
        tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (buf.getInt(4) != payload.length - 8) return None
    // chunk walk from offset 12
    var pos = 12
    var channels = 0; var sampleRate = 0; var fmtOk = false
    var dataOff = -1; var dataSize = -1
    while (pos + 8 <= payload.length && (!fmtOk || dataOff < 0)) {
      val id = tag(payload, pos)
      val size = buf.getInt(pos + 4)
      // Long arithmetic: a declared size near Int.MaxValue must fail the
      // bounds check, not wrap negative and walk pos off the payload.
      if (size < 0 || pos.toLong + 8L + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(pos + 8)
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 8 ||
              sampleRate <= 0) return None
          fmtOk = true
        case "data" =>
          dataOff = pos + 8
          dataSize = size
        case _ => ()                       // skip unknown chunks
      }
      pos += 8 + size + (size & 1)         // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val frameBytes = channels * 2
    if (dataSize % frameBytes != 0) return None
    val frames = dataSize / frameBytes
    if (frames == 0) return None
    Some((channels, sampleRate, dataOff, frames))
  }

  /** 8-slot feature vector; plain double arithmetic in a fixed order so
    * the q63 oracle reproduces it bit-for-bit.
    */
  def features(d: Decoded): Array[Float] = Array(
    (d.meanCh0 / 32768.0).toFloat,
    (d.meanCh1 / 32768.0).toFloat,
    (d.meanAbs / 32768.0).toFloat,
    (d.peak / 32768.0).toFloat,
    (d.frames / 1000.0).toFloat,
    (d.sampleRate / 100000.0).toFloat,
    (d.channels / 10.0).toFloat,
    (d.frames.toDouble / d.sampleRate).toFloat)
}
