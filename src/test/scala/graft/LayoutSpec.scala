package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sinks.Layout

/** Z-order layout claims ([[graft.functions.ZOrder]] +
  * [[graft.sinks.Layout]]) that q138's key oracle can't express:
  * Morton correctness against an independent bit-by-bit reference,
  * and the actual file-level pruning — per-file min/max footprints
  * measured on real written parquet, z-order vs single-column sort.
  */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zorder2 matches the bit-by-bit Morton reference, including high bits") {
    val samples = Seq(0, 1, 2, 3, 7, 8, 255, 256, 65535, 65536,
      0x12345678, Int.MaxValue)
    val df = (for (a <- samples; b <- samples) yield (a, b)).toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        ZOrder.zorder2(col("a"), col("b")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === ZOrder.mortonRef(a, b), s"zorder2($a, $b)")
    }
    // interleave is order-sensitive: swapping operands swaps bit planes
    val z12 = ZOrder.mortonRef(1, 0)
    val z21 = ZOrder.mortonRef(0, 1)
    assert(z12 === 1L && z21 === 2L)
  }

  /** Per-file (min, max) of a column, read from the written files. */
  private def footprints(dir: String, c: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c)).cast("long"), max(col(c)).cast("long"))
        .as[(Long, Long)].head()
      r
    }
  }

  private def touching(fps: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    fps.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("z-ordered files prune on EITHER dimension; a single-column sort prunes only its own") {
    // 64x64 grid, one row per cell — both dims uniform
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val sDir = Files.createTempDirectory("graft_sorted").toString
    try {
      Layout.zorderWrite(grid, col("x"), col("y"), zDir, numFiles = 16)
      Layout.sortedWrite(grid, col("x"), sDir, numFiles = 16)
      val (zx, zy) = (footprints(zDir, "x"), footprints(zDir, "y"))
      val (sx, sy) = (footprints(sDir, "x"), footprints(sDir, "y"))
      assert(zx.size === 16 && sx.size === 16)
      // narrow slice in y (1/8 of the space): the x-sorted layout
      // cannot skip anything; the z-ordered layout reads a fraction
      assert(touching(sy, 0, 7) === 16, "x-sort never prunes y")
      assert(touching(zy, 0, 7) <= 8, s"z-order must prune y: ${zy}")
      // narrow slice in x: both layouts prune (x-sort prunes harder —
      // that's the single-dimension trade the z-curve makes)
      assert(touching(sx, 0, 7) <= 4)
      assert(touching(zx, 0, 7) <= 8, s"z-order must prune x: ${zx}")
      // and a 2-D box prunes to a handful of files under z-order
      val both = footprints(zDir, "x").zip(footprints(zDir, "y"))
      val boxFiles = both.count { case ((xmn, xmx), (ymn, ymx)) =>
        xmx >= 0 && xmn <= 15 && ymx >= 0 && ymn <= 15 }
      // range-partition boundaries don't align exactly with Z-squares,
      // so the 4-file ideal leaks a boundary file or two
      assert(boxFiles <= 6, s"16x16 corner box should live in few z-files, got $boxFiles")
    } finally {
      Seq(zDir, sDir).foreach { d =>
        val f = new java.io.File(d)
        Option(f.listFiles()).foreach(_.foreach(_.delete())); f.delete()
      }
    }
  }

  test("quantile bucketing keeps z-order pruning under heavy value skew") {
    // 90% of rows live at x=0 (hot key); y uniform — equal-width
    // bucketing would put ~all rows in one x-bucket stripe
    val skewed = ((0 until 3600).map(i => (0L, (i % 60).toLong)) ++
      (for (x <- 1L to 20L; y <- 0L until 20L) yield (x, y))).toDF("x", "y")
    val dir = Files.createTempDirectory("graft_zskew").toString
    try {
      Layout.zorderWrite(skewed, col("x"), col("y"), dir, numFiles = 8)
      val fy = footprints(dir, "y")
      // y still prunes despite the x hot key: a narrow y slice must
      // not touch every file
      assert(touching(fy, 0, 6) < 8, s"y footprints under skew: $fy")
    } finally {
      val f = new java.io.File(dir)
      Option(f.listFiles()).foreach(_.foreach(_.delete())); f.delete()
    }
  }
}
