package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ⊕ Perceptual image hashing — the image-modality member of the
  * dedup family. LLM training pipelines dedup images as well as text
  * (re-hosted thumbnails, recompressed copies, watermark variants);
  * byte-level hashing misses them because a re-encode changes every
  * byte. An average hash (aHash) over DECODED pixels is invariant to
  * container format and byte layout, and near-invariant to small
  * retouches — so near-duplicate images land within a few bits and
  * the banded hamming join from the text-SimHash path
  * ([[Dedup.hammingPairs64]]) finds them without an all-pairs pass.
  *
  * All-integer arithmetic end to end (luma kept ×1000 — no division
  * until the truncating block/global means), so the whole
  * hash-and-pair pipeline is exactly mirrorable in ANSI SQL (q101's
  * oracle recomputes every bit).
  */
object ImageHash {

  /** 64-bit average hash of decoded pixels: integer luma
    * (299R+587G+114B, ×1000 scale), adaptive 8×8 box blocks
    * (`bx = x*8/w` — any dims ≥ 8×8), truncating per-block means,
    * bit `by*8+bx` set iff its block mean exceeds the truncated
    * global mean of the 64 block means. None for images smaller than
    * 8×8 (some blocks would be empty).
    */
  def aHash(w: Int, h: Int, px: Array[Int]): Option[Long] = {
    if (w < 8 || h < 8) return None
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val j = by * 8 + x * 8 / w
        val v = px(y * w + x)
        sums(j) += 299L * ((v >> 16) & 0xff) + 587L * ((v >> 8) & 0xff) +
          114L * (v & 0xff)
        cnts(j) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(j => sums(j) / cnts(j))
    val m = means.sum / 64
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (means(j) > m) hash |= 1L << j
      j += 1
    }
    Some(hash)
  }

  /** Hash stage: `(media_id, payload)` → `(id, sig)`. Content-
    * dispatched over the lossless pixel decoders (BMP/PNG/GIF);
    * undecodable payloads and sub-8×8 images are DROPPED (S5
    * tolerance). Same `mapPartitions` boundary as the other decode
    * stages; the emitted row is 16 bytes however large the image —
    * downstream joins never touch pixels.
    */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(payload)
          .flatMap(p => BmpCodec.decodePixels(p)
            .orElse(PngCodec.decodePixels(p))
            .orElse(GifCodec.decodePixels(p)))
          .flatMap { case (w, h, px) => aHash(w, h, px) }
          .map(sig => (id, sig))
      }).toDF("id", "sig")
  }

  /** Image near-dup pairs `(id_a, id_b, hamming)`: aHash each image,
    * then the banded hamming self-join — complete for
    * `maxHamming` ≤ 3, candidate generation bucketed (never
    * all-pairs), `maxBucket` as the skew backstop.
    */
  def nearDupImages(media: DataFrame, maxHamming: Int = 3,
                    maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hammingPairs64(imageHashes(media), maxHamming, maxBucket)
}
