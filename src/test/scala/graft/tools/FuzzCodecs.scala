package graft.tools

import graft.ext._

/** Dev-only heavy fuzzer for the six codecs (the in-suite fuzz test
  * runs a fixed-seed subset; this drives many seeds/iterations).
  * Usage: Test/runMain graft.tools.FuzzCodecs [seed] [iters]
  */
object FuzzCodecs {
  def main(args: Array[String]): Unit = {
    val seed = if (args.length > 0) args(0).toLong else 1L
    val iters = if (args.length > 1) args(1).toInt else 20000
    val rnd = new scala.util.Random(seed)
    val valid: Seq[Array[Byte]] = Seq(
      BmpCodec.encode(17, 11, (x, y) => (x * 20 % 256, y * 30 % 256, (x + y) % 256)),
      PngCodec.encode(17, 11, (x, y) => (x * 20 % 256, y * 30 % 256, (x + y) % 256)),
      GifCodec.encode(33, 21, Array.tabulate(64)(i => (i * 4, i * 2, i)), (x, y) => (x * 3 + y * 5) % 64),
      JpegCodec.encodeGray(24, 16, (x, y) => (x * 16 + y) % 256),
      JpegCodec.encodeRgb(24, 16, (x, y) => (x * 9 % 256, y * 7 % 256, (x * y) % 256)),
      JpegCodec.encodeRgb420(24, 16, (x, y) => (x * 9 % 256, y * 7 % 256, (x * y) % 256)),
      JpegCodec.encodeGray(32, 16, (x, y) => (x + y) % 256, restartInterval = 1),
      WavCodec.encode(2, 8000, 100, (f, c) => (f * 31 + c * 7) % 65536 - 32768),
      AdpcmCodec.encode(2, 8000, 99, (f, c) => (f * 31 + c * 7) % 65536 - 32768),
      AdpcmCodec.encode(1, 8000, 45, (f, _) => 100 + math.abs((f % 20) - 10)),
      AviCodec.encode(16, 8, 40000,
        (0 until 3).map(f => JpegCodec.encodeGray(16, 8, (x, y) => (x * 16 + y + f * 31) % 256))))
    var crashes = 0
    def all(p: Array[Byte], what: String): Unit =
      for ((n, f) <- Seq[(String, Array[Byte] => Any)](
          "bmp" -> BmpCodec.decode, "png" -> PngCodec.decode,
          "gif" -> GifCodec.decode, "jpg" -> JpegCodec.decode,
          "wav" -> WavCodec.decode, "adpcm" -> AdpcmCodec.decode,
          "avi" -> AviCodec.decode)) {
        try f(p)
        catch { case e: Throwable =>
          crashes += 1
          println(s"CRASH $n on $what: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    for (i <- 0 until iters) {
      val base = valid(rnd.nextInt(valid.length))
      val mode = rnd.nextInt(4)
      val p = mode match {
        case 0 => // mutate 1..16 bytes
          val m = base.clone()
          for (_ <- 0 to rnd.nextInt(16)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          m
        case 1 => base.take(rnd.nextInt(base.length + 1)) // truncate anywhere
        case 2 => // splice two payloads
          val other = valid(rnd.nextInt(valid.length))
          base.take(rnd.nextInt(base.length + 1)) ++ other.drop(rnd.nextInt(other.length + 1))
        case _ => Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte)
      }
      all(p, s"iter $i mode $mode")
      if (crashes > 20) { println("too many crashes, stopping"); sys.exit(1) }
    }
    println(s"fuzz done: $iters iters, $crashes crashes")
    if (crashes > 0) sys.exit(1)
  }
}
