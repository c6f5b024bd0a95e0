package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ⊕ Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * Six REAL pure-JVM codecs are content-dispatched on the decode
  * path — [[BmpCodec]] (24-bpp BMP), [[PngCodec]] (RGB8 PNG, all five
  * scanline filters, any zlib stream), [[GifCodec]] (palette GIF with
  * a from-scratch variable-width LZW decompressor — real entropy
  * coding), [[JpegCodec]] (baseline DCT JPEG), [[WavCodec]] (16-bit
  * PCM WAV), [[AdpcmCodec]] (IMA ADPCM compressed audio — the
  * step-table recurrence, not a fixed-layout read). [[StubCodec]]
  * remains ONLY
  * as the labeled fallback for media kinds with no real decoder
  * (e.g. video), "decoding" a payload into a deterministic
  * byte-derived vector. Equally load-bearing is the Spark-side shape:
  * the schema, the binary-safe column ops, the `mapPartitions` batch
  * boundary where a codec amortizes per-batch init (model load, codec
  * context), and the partition sizing so one partition's payloads fit
  * in executor memory.
  *
  * Scale notes: payloads dominate row size, so (a) metadata-only
  * predicates are pushed BEFORE any stage that touches `payload`
  * (parquet column pruning means filtered scans never read payload
  * pages); (b) decode uses `mapPartitions`, not a per-row UDF, so a
  * real codec initializes once per partition, not per row; (c)
  * `repartition(byBytes)` sizes partitions by payload bytes, not row
  * count.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true))), nullable = true)))

  case class MediaFeature(media_id: Long, kind: String, n_bytes: Long,
                          checksum: String, features: Array[Float])

  /** Deterministic fake decoder: feature j = mean of payload bytes
    * congruent to j (mod dim), scaled to [0,1]. A real implementation
    * would replace ONLY this object (decode signature is the
    * contract).
    */
  object StubCodec {
    val dim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        sums(i % dim) += (payload(i) & 0xff)
        counts(i % dim) += 1
        i += 1
      }
      // double-precision mean narrowed to float at the end: the same
      // value is reproducible in ANSI SQL (DuckDB CAST(... AS REAL)),
      // so the decode path is oracle-checkable byte-for-byte
      Array.tabulate(dim)(j =>
        if (counts(j) == 0) 0f else (sums(j).toDouble / counts(j) / 255.0).toFloat)
    }
  }

  /** Decode stage: mapPartitions so a real codec would init once per
    * partition. Null payloads are dropped (error-tolerance, S5
    * semantics). Structurally valid 24-bpp BMP payloads take the REAL
    * decoder ([[BmpCodec]] — pure JVM, pixel-derived features); all
    * other payloads keep the documented [[StubCodec]] byte-mean fake.
    * The BMP validator requires declared-file-size == payload-length
    * plus full header checks, so arbitrary bytes cannot false-positive
    * into the image path.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // decoder context init: once per partition, not per row
        val md = java.security.MessageDigest.getInstance("MD5")
        it.collect { case (id, kind, payload) if payload != null =>
          md.reset()
          MediaFeature(id, kind, payload.length.toLong,
            md.digest(payload).map("%02x".format(_)).mkString,
            BmpCodec.decode(payload).map(BmpCodec.features)
              .orElse(PngCodec.decode(payload).map(PngCodec.features))
              .orElse(GifCodec.decode(payload).map(GifCodec.features))
              .orElse(JpegCodec.decode(payload).map(JpegCodec.features))
              .orElse(WavCodec.decode(payload).map(WavCodec.features))
              .orElse(AdpcmCodec.decode(payload).map(WavCodec.features))
              .getOrElse(StubCodec.decode(payload)))
        }
      }
  }

  case class ImageFeature(media_id: Long, width: Int, height: Int,
                          n_bytes: Long, features: Array[Float])

  case class AudioFeature(media_id: Long, channels: Int, sample_rate: Int,
                          n_frames: Long, n_bytes: Long, features: Array[Float])

  /** Audio-decode stage exposing the parsed stream parameters: same
    * `mapPartitions` boundary, rows whose payload is not a valid
    * 16-bit PCM WAV or IMA ADPCM WAV ([[AdpcmCodec]] — real
    * compressed-audio decode) are DROPPED (S5 error tolerance). The
    * two formats are disjoint on the fmt chunk's audioFormat field,
    * so dispatch order carries no semantics.
    */
  def decodeWaves(media: DataFrame): Dataset[AudioFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(payload)
          .flatMap(p => WavCodec.decode(p).orElse(AdpcmCodec.decode(p)))
          .map(d =>
            AudioFeature(id, d.channels, d.sampleRate, d.frames.toLong,
              payload.length.toLong, WavCodec.features(d)))
      })
  }

  /** Image-decode stage exposing the parsed dimensions: same
    * `mapPartitions` batch boundary as [[decodeFeatures]], but rows
    * whose payload is not a valid image are DROPPED (the
    * error-tolerant S5 semantics a real decode stage needs — one
    * corrupt file must not fail the job). Content-dispatched: BMP,
    * PNG and GIF payloads each take their real decoder; features are
    * codec-independent (identical 8-slot formula).
    */
  def decodeImages(media: DataFrame): Dataset[ImageFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(payload).flatMap { p =>
          BmpCodec.decode(p)
            .map(d => ImageFeature(id, d.width, d.height, p.length.toLong,
              BmpCodec.features(d)))
            .orElse(PngCodec.decode(p)
              .map(d => ImageFeature(id, d.width, d.height, p.length.toLong,
                PngCodec.features(d))))
            .orElse(GifCodec.decode(p)
              .map(d => ImageFeature(id, d.width, d.height, p.length.toLong,
                GifCodec.features(d))))
            .orElse(JpegCodec.decode(p)
              .map(d => ImageFeature(id, d.width, d.height, p.length.toLong,
                JpegCodec.features(d))))
        }
      })
  }

  case class VideoFrameFeature(media_id: Long, frame_idx: Int, delay_cs: Int,
                               n_frames: Int, width: Int, height: Int,
                               features: Array[Float])

  /** REAL frame-sampling stage: decode an animated GIF's frames with
    * full player-side compositing ([[GifCodec.decodeAnimated]] —
    * sub-rectangle frames, transparency, disposal, local palettes),
    * keep every `every`-th composited frame, and emit per-frame
    * features (same 8-slot formula as the image path). This is the
    * video analogue of [[decodeImages]]: same `mapPartitions`
    * boundary, invalid payloads DROPPED (S5 tolerance). The
    * byte-range [[sampleFrames]] remains for container formats with
    * no decoder; animated GIF is the real-codec path.
    *
    * Sampling happens AFTER decode because GIF frames are deltas —
    * frame f's composite needs frames 0..f-1 regardless of which
    * frames are kept (the same reason video keyframe extraction
    * still reads the inter-frame stream).
    */
  def decodeVideoFrames(media: DataFrame, every: Int = 1): Dataset[VideoFrameFeature] = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        if (payload == null) Nil
        else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
                 payload(2) == 'F' && payload(3) == 'F' &&
                 payload(8) == 'A' && payload(9) == 'V' && payload(10) == 'I') {
          // MJPEG AVI: frames are independent JPEGs, so (unlike the
          // GIF delta path below) sampling never needs the skipped
          // frames' pixels — but decode-then-filter keeps the two
          // paths' semantics identical
          AviCodec.decode(payload).toSeq.flatMap { v =>
            v.frames.iterator.zipWithIndex
              .filter(_._2 % every == 0)
              .map { case (d, i) =>
                VideoFrameFeature(id, i, v.delayCs, v.frames.length,
                  d.width, d.height, JpegCodec.features(d))
              }
          }
        } else GifCodec.decodeAnimated(payload).toSeq.flatMap { fs =>
          fs.iterator
            .filter(_.frameIdx % every == 0)
            .map(f => VideoFrameFeature(id, f.frameIdx, f.delayCs, fs.length,
              f.canvas.width, f.canvas.height, GifCodec.features(f.canvas)))
        }
      })
  }

  /** Frame-sampling stage: split a payload into `n` contiguous byte
    * ranges ("frames") — pure column ops (binary `substring` is
    * codegen'd), exploded to one row per frame. A real video codec
    * would replace the slicing with keyframe extraction; the row
    * explosion shape is the same.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val total = length(col("payload"))
    // integer frame boundaries: start_i = floor(i*total/n), end_i =
    // floor((i+1)*total/n) — frames exactly partition the payload
    // (Column./ is double division; floor() keeps the math integral)
    val frames = transform(sequence(lit(0), lit(n - 1)), i => {
      val lo = floor((i.cast("long") * total) / n)
      val hi = floor(((i.cast("long") + 1) * total) / n)
      struct(i.as("frame_idx"),
        substring(col("payload"), (lo + 1).cast("int"), (hi - lo).cast("int")).as("frame"))
    })
    media
      .filter(col("payload").isNotNull && total >= n)
      .select(col("media_id"), col("kind"), explode(frames).as("f"))
      .select(col("media_id"), col("kind"), col("f.frame_idx"), col("f.frame"),
        length(col("f.frame")).as("frame_bytes"))
  }

  case class ResizedMedia(media_id: Long, orig_width: Int, orig_height: Int,
                          width: Int, height: Int, payload: Array[Byte])

  /** REAL pixel resize: integer-factor BOX downsample over decoded
    * pixels — each output pixel is the channel-wise integer mean
    * (truncating division, exactly mirrorable in SQL) of its
    * `factor`×`factor` source block, partial edge blocks averaged
    * over their actual pixel count, so any dimensions work and
    * out-dims are ⌈w/f⌉×⌈h/f⌉. Content-dispatched over the lossless
    * pixel decoders (BMP, PNG, GIF); the result is re-encoded as
    * 24-bpp BMP — one canonical output format, the thumbnail-
    * pipeline convention — so downstream [[decodeImages]] proves the
    * resized payload is itself a real decodable image. Rows whose
    * payload is not a valid image are DROPPED (S5 tolerance). Same
    * `mapPartitions` boundary as the other decode stages.
    *
    * Box (area-average) rather than bilinear: for integer-factor
    * DOWNsampling they coincide in intent (anti-aliased mean over the
    * footprint), but box is exact in integer arithmetic — which is
    * what makes the stage oracle-checkable bit-for-bit.
    */
  def resizeImages(media: DataFrame, factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(payload)
          .flatMap(p => BmpCodec.decodePixels(p)
            .orElse(PngCodec.decodePixels(p))
            .orElse(GifCodec.decodePixels(p)))
          .map { case (w, h, px) =>
            val w2 = (w + factor - 1) / factor
            val h2 = (h + factor - 1) / factor
            val out = BmpCodec.encode(w2, h2, (x2, y2) => {
              val x0 = x2 * factor; val y0 = y2 * factor
              val xe = math.min(x0 + factor, w); val ye = math.min(y0 + factor, h)
              var sr = 0; var sg = 0; var sb = 0
              var y = y0
              while (y < ye) {
                var x = x0
                while (x < xe) {
                  val v = px(y * w + x)
                  sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
                  x += 1
                }
                y += 1
              }
              val cnt = (xe - x0) * (ye - y0)
              (sr / cnt, sg / cnt, sb / cnt)
            })
            ResizedMedia(id, w, h, w2, h2, out)
          }
      })
  }

  /** Resize stage (metadata transform; a real impl would also
    * transform payload): clamps width/height preserving aspect.
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h))
    media.withColumn("meta",
      struct(
        round(w * scale).cast("int").as("width"),
        round(h * scale).cast("int").as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms")))
  }

  /** Payload-aware repartition with a known byte total: choose the
    * partition COUNT from total payload bytes (~`targetBytes` per
    * partition — row-count sizing is wrong when payloads vary 1000×)
    * and distribute round-robin. Approximation: partitions are
    * balanced in expectation, not bin-packed — a single payload larger
    * than `targetBytes` still owns its partition's overage.
    */
  def repartitionByBytes(media: DataFrame, targetBytes: Long, totalBytes: Long): DataFrame = {
    require(targetBytes > 0)
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts)  // no column → round-robin distribution
  }

  /** Sizing convenience that MEASURES the byte total first — this runs
    * an eager aggregation job (a full extra pass over the payload
    * column) at call time, so call it once at a pipeline boundary, not
    * inside a composed transform. Prefer the `totalBytes` overload
    * when the size is already known (e.g. from file metadata).
    */
  def repartitionByBytes(media: DataFrame, targetBytes: Long): DataFrame = {
    val totalBytes = Option(media.agg(sum(length(col("payload")))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    repartitionByBytes(media, targetBytes, totalBytes)
  }
}
