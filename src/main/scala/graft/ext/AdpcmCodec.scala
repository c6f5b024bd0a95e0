package graft.ext

/** Pure-JVM IMA ADPCM (DVI4) codec in the RIFF/WAVE container
  * (audioFormat = 0x0011, 4 bits per sample) — the compressed-audio
  * counterpart to the entropy-coded image decoders ([[GifCodec]],
  * [[JpegCodec]]): every sample after a block header is reconstructed
  * through the real step-table recurrence (sign/magnitude nibble →
  * `step>>3 (+step) (+step>>1) (+step>>2)` delta, predictor clamp,
  * step-index walk), not a fixed-layout read like PCM
  * ([[WavCodec]]). No native libraries; tables are from the public
  * IMA ADPCM specification.
  *
  * Container layout written by [[encode]] (and required, modulo
  * chunk order, by [[decode]]):
  *   RIFF(12) · `fmt `(8+20: PCM fields + cbSize=2 +
  *   samplesPerBlock) · `fact`(8+4: total frames) · `data`(8 + n
  *   blocks × blockAlign). Per block and channel: a 4-byte header
  *   (predictor int16 = the block's FIRST sample emitted verbatim,
  *   step index, reserved 0), then the channels' nibble words
  *   interleaved 4 bytes at a time, low nibble first — so
  *   `samplesPerBlock = 1 + 8 × wordsPerChannel`.
  *
  * Correctness surface: q94 synthesizes ADPCM WAVs from a unit-step
  * triangle formula. At step index 0 the step is 7, where nibble
  * deltas 0/±1 are EXACT (`7>>3 = 0`, `7>>3 + 7>>2 = 1`) and every
  * magnitude < 4 keeps the index pinned at 0 — so a signal whose
  * consecutive samples differ by at most 1 round-trips BIT-EXACTLY
  * through the real decoder, and the DuckDB oracle recomputes all
  * features from the formula alone (block walk, per-channel header,
  * nibble order, de-interleave and size math are all hash-checked).
  * Lossy-regime behavior (large deltas, index walk up the table,
  * clamping) is spec-tested with tolerance + known vectors instead.
  */
object AdpcmCodec {

  /** Index adjustment per nibble magnitude (low 3 bits). */
  private val indexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** The 89-step quantizer table from the IMA spec. */
  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private def clampS16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** Decoder reconstruction of one nibble — shared by encode (to keep
    * the predictor in lock-step with the decoder) and decode.
    * Returns the new (predictor, index).
    */
  private def step(nib: Int, pred: Int, index: Int): (Int, Int) = {
    val st = stepTable(index)
    var diff = st >> 3
    if ((nib & 4) != 0) diff += st
    if ((nib & 2) != 0) diff += st >> 1
    if ((nib & 1) != 0) diff += st >> 2
    val p = clampS16(if ((nib & 8) != 0) pred - diff else pred + diff)
    val i = math.max(0, math.min(88, index + indexTable(nib & 7)))
    (p, i)
  }

  /** Quantize `target - pred` to a nibble at the current step (the
    * canonical sign+successive-halves comparison), then advance state
    * via the decoder's own reconstruction.
    */
  private def quantize(target: Int, pred: Int, index: Int): Int = {
    var diff = target - pred
    var nib = 0
    if (diff < 0) { nib = 8; diff = -diff }
    val st = stepTable(index)
    if (diff >= st) { nib |= 4; diff -= st }
    if (diff >= (st >> 1)) { nib |= 2; diff -= st >> 1 }
    if (diff >= (st >> 2)) nib |= 1
    nib
  }

  /** Encode `sample(frame, channel)` (signed 16-bit) as an IMA ADPCM
    * WAV. `frames` must fill whole blocks (`frames % samplesPerBlock
    * == 0`) and `samplesPerBlock` must be `1 + 8k` so each channel's
    * nibbles pack into whole 4-byte words.
    */
  def encode(channels: Int, sampleRate: Int, frames: Int,
             sample: (Int, Int) => Int,
             samplesPerBlock: Int = 9): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && frames > 0)
    require(samplesPerBlock > 1 && (samplesPerBlock - 1) % 8 == 0,
      s"samplesPerBlock must be 1+8k, got $samplesPerBlock")
    require(frames % samplesPerBlock == 0,
      s"frames ($frames) must fill whole blocks of $samplesPerBlock")
    val wordsPerCh = (samplesPerBlock - 1) / 8
    val blockAlign = channels * (4 + 4 * wordsPerCh)
    val nBlocks = frames / samplesPerBlock
    val dataSize = nBlocks * blockAlign
    val buf = java.nio.ByteBuffer.allocate(60 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(52 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(20)
    buf.putShort(0x0011)                 // audioFormat = IMA ADPCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt((sampleRate.toLong * blockAlign / samplesPerBlock).toInt)
    buf.putShort(blockAlign.toShort)
    buf.putShort(4)                      // bits per (encoded) sample
    buf.putShort(2)                      // cbSize
    buf.putShort(samplesPerBlock.toShort)
    buf.put("fact".getBytes("US-ASCII"))
    buf.putInt(4)
    buf.putInt(frames)
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    val index = new Array[Int](channels)  // persists across blocks
    var b = 0
    while (b < nBlocks) {
      val first = b * samplesPerBlock
      val pred = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        // block header: first sample verbatim + current step index
        pred(c) = clampS16(sample(first, c))
        buf.putShort(pred(c).toShort)
        buf.put(index(c).toByte)
        buf.put(0.toByte)
        c += 1
      }
      var w = 0
      while (w < wordsPerCh) {
        c = 0
        while (c < channels) {
          var byteI = 0
          while (byteI < 4) {
            var packed = 0
            var half = 0
            while (half < 2) {
              val frame = first + 1 + w * 8 + byteI * 2 + half
              val nib = quantize(clampS16(sample(frame, c)), pred(c), index(c))
              val (p, i) = step(nib, pred(c), index(c))
              pred(c) = p; index(c) = i
              packed |= (nib & 0xf) << (4 * half)   // low nibble first
              half += 1
            }
            buf.put(packed.toByte)
            byteI += 1
          }
          c += 1
        }
        w += 1
      }
      b += 1
    }
    buf.array()
  }

  private def tag(payload: Array[Byte], at: Int): String =
    new String(payload, at, 4, "US-ASCII")

  /** None unless the payload is a structurally valid IMA ADPCM WAV
    * (RIFF size == payload length, audioFormat 0x0011, 4 bits,
    * samplesPerBlock consistent with blockAlign, whole blocks, fact
    * frame count filling the last block) — strict enough that neither
    * arbitrary bytes nor a PCM WAV can false-positive into this path.
    * Returns the same stats record as [[WavCodec.decode]] so the
    * 8-slot feature formula is shared.
    */
  def decode(payload: Array[Byte]): Option[WavCodec.Decoded] = {
    var s0 = 0L; var s1 = 0L; var sAbs = 0L; var peak = 0
    decodeWith(payload, (c, _, v) => {
      if (c == 0) s0 += v
      if (c == 1) s1 += v
      val a = math.abs(v)
      sAbs += a
      if (a > peak) peak = a
    }).map { case (channels, sampleRate, factFrames) =>
      WavCodec.Decoded(channels, sampleRate, factFrames,
        s0.toDouble / factFrames,
        if (channels > 1) s1.toDouble / factFrames else 0.0,
        sAbs.toDouble / (factFrames.toLong * channels),
        peak)
    }
  }

  /** Full sample decode (interleaved, frame-major) for stages that
    * transform samples (audio fingerprinting): two passes — the
    * first validates and sizes, the second fills — because ADPCM's
    * emission order is channel-major within a block. Bounded by
    * `maxFrames` against crafted headers.
    */
  def decodeSamples(payload: Array[Byte],
                    maxFrames: Int = 1 << 24): Option[(Int, Int, Array[Int])] =
    decodeWith(payload, (_, _, _) => ()).flatMap {
      case (channels, sampleRate, frames) =>
        if (frames > maxFrames) None
        else {
          val out = new Array[Int](frames * channels)
          decodeWith(payload, (c, f, v) => out(f * channels + c) = v)
          Some((channels, sampleRate, out))
        }
    }

  /** Shared strict walk: validates the container and streams every
    * reconstructed sample to `emit(channel, frameIdx, value)`;
    * returns (channels, sampleRate, frames) or None.
    */
  private def decodeWith(payload: Array[Byte],
                         emit0: (Int, Int, Int) => Unit): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 60 ||
        tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (buf.getInt(4) != payload.length - 8) return None
    var pos = 12
    var channels = 0; var sampleRate = 0; var spb = 0; var blockAlign = 0
    var fmtOk = false
    var factFrames = -1
    var dataOff = -1; var dataSize = -1
    while (pos + 8 <= payload.length && (!fmtOk || dataOff < 0 || factFrames < 0)) {
      val id = tag(payload, pos)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos.toLong + 8L + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 20) return None
          if (buf.getShort(pos + 8) != 0x0011) return None
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          blockAlign = buf.getShort(pos + 20) & 0xffff
          val bits = buf.getShort(pos + 22)
          val cbSize = buf.getShort(pos + 24) & 0xffff
          if (bits != 4 || cbSize < 2 || channels < 1 || channels > 8 ||
              sampleRate <= 0) return None
          spb = buf.getShort(pos + 26) & 0xffff
          // nibble words: blockAlign = ch * (4 header + 4 per 8 samples)
          if (spb < 2 || (spb - 1) % 8 != 0 ||
              blockAlign != channels * (4 + (spb - 1) / 2)) return None
          fmtOk = true
        case "fact" =>
          if (size < 4) return None
          factFrames = buf.getInt(pos + 8)
          if (factFrames <= 0) return None
        case "data" =>
          dataOff = pos + 8
          dataSize = size
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    if (!fmtOk || dataOff < 0 || factFrames < 0) return None
    if (dataSize <= 0 || dataSize % blockAlign != 0) return None
    val nBlocks = dataSize / blockAlign
    val capacity = nBlocks.toLong * spb
    // fact must land in the last block (no phantom trailing blocks)
    if (factFrames > capacity || factFrames <= capacity - spb) return None
    val wordsPerCh = (spb - 1) / 8
    var emitted = 0L
    val pred = new Array[Int](channels)
    val index = new Array[Int](channels)
    var b = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      var c = 0
      while (c < channels) {
        pred(c) = buf.getShort(base + 4 * c).toInt
        index(c) = payload(base + 4 * c + 2) & 0xff
        if (index(c) > 88 || payload(base + 4 * c + 3) != 0) return None
        c += 1
      }
      // per-channel frame cursor within this block; header = frame 0
      val blockFrames = math.min(spb.toLong, factFrames - b.toLong * spb).toInt
      c = 0
      while (c < channels) {
        if (blockFrames > 0) {
          emit0(c, b * spb, pred(c)); emitted += (if (c == 0) 1 else 0)
        }
        c += 1
      }
      val nibbleBase = base + 4 * channels
      var w = 0
      while (w < wordsPerCh) {
        c = 0
        while (c < channels) {
          val wordOff = nibbleBase + (w * channels + c) * 4
          var byteI = 0
          while (byteI < 4) {
            val by = payload(wordOff + byteI) & 0xff
            var half = 0
            while (half < 2) {
              val frame = 1 + w * 8 + byteI * 2 + half
              val nib = (by >> (4 * half)) & 0xf
              val (p, i) = step(nib, pred(c), index(c))
              pred(c) = p; index(c) = i
              if (frame < blockFrames) {
                emit0(c, b * spb + frame, p)
                if (c == 0) emitted += 1
              }
              half += 1
            }
            byteI += 1
          }
          c += 1
        }
        w += 1
      }
      b += 1
    }
    if (emitted != factFrames) return None
    Some((channels, sampleRate, factFrames))
  }
}
