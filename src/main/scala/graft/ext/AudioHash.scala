package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ⊕ Audio fingerprinting — the audio-modality member of the dedup
  * family, completing the text ([[Dedup]]) / image ([[ImageHash]]) /
  * audio trio. The fingerprint is an energy-delta hash (the shape
  * underlying published audio-fingerprint schemes: band/segment
  * energies, then sign-of-change bits): the stream is mono-mixed,
  * split into 65 equal segments, each segment's energy computed as
  * the sum of squared mixed samples, and bit i of the 64-bit hash is
  * set iff segment i+1 is MORE energetic than segment i. Decoded-
  * domain hashing makes it container-invariant: the same signal
  * through the PCM and IMA-ADPCM containers fingerprints identically
  * whenever the ADPCM roundtrip is exact (q94's bit-exact regime).
  *
  * All-integer (Long energy sums — mixed sample ≤ 8·32768, squared
  * 2^36, × 2^24 frames < 2^63), so q102's oracle recomputes every
  * bit and the brute-force pair set in SQL.
  */
object AudioHash {

  /** 64-bit energy-delta fingerprint of interleaved samples: segment
    * k covers frames [k·n/65, (k+1)·n/65), energy = Σ (Σ_c sample)²,
    * bit i = energy(i+1) > energy(i). None under 65 frames (empty
    * segments).
    */
  def fingerprint(channels: Int, samples: Array[Int]): Option[Long] = {
    val n = samples.length / channels
    if (n < 65) return None
    val e = new Array[Long](65)
    var f = 0
    while (f < n) {
      var mix = 0L
      var c = 0
      while (c < channels) { mix += samples(f * channels + c); c += 1 }
      e((f * 65 / n).toInt) += mix * mix
      f += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) hash |= 1L << i
      i += 1
    }
    Some(hash)
  }

  /** Hash stage: `(media_id, payload)` → `(id, sig)` over the audio
    * decoders (16-bit PCM WAV, IMA ADPCM — disjoint on audioFormat);
    * undecodable payloads and sub-65-frame streams DROPPED (S5).
    */
  def audioHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(payload)
          .flatMap(p => WavCodec.decodeSamples(p)
            .orElse(AdpcmCodec.decodeSamples(p)))
          .flatMap { case (ch, _, samples) => fingerprint(ch, samples) }
          .map(sig => (id, sig))
      }).toDF("id", "sig")
  }

  /** Audio near-dup pairs `(id_a, id_b, hamming)` via the shared
    * banded hamming join ([[Dedup.hammingPairs64]]) — complete for
    * `maxHamming` ≤ 3, never all-pairs.
    */
  def nearDupAudio(media: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hammingPairs64(audioHashes(media), maxHamming, maxBucket)
}
