package graft

import org.apache.spark.sql.functions._
import graft.functions.BmpPixelStats

/** Real uncompressed-BMP pixel decode (functions/ImageExpressions):
  * multi-row rasters with stride padding, orientation invariance, and
  * strict nulls for non-decodable payloads.
  */
class BmpPixelStatsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("payload")
      .select(BmpPixelStats.bmpPixelStats(col("payload")).as("st"))
      .select(col("st.width"), col("st.height"), col("st.n_pixels"),
        col("st.sum_r"), col("st.sum_g"), col("st.sum_b"))
      .collect()(0)

  test("3x2 raster decodes exactly through stride padding") {
    // width 3 → row stride 12 (9 data + 3 pad): the padding-skip path
    val pixels = Array((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (10, 20, 30), (40, 50, 60), (70, 80, 90))
    val r = statsOf(BmpPixelStats.bmpBytes(3, 2, pixels))
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 6L)
    assert(r.getLong(3) == pixels.map(_._1.toLong).sum)
    assert(r.getLong(4) == pixels.map(_._2.toLong).sum)
    assert(r.getLong(5) == pixels.map(_._3.toLong).sum)
  }

  test("top-down (negative height) rasters decode with the same sums") {
    val pixels = Array((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))
    val bottomUp = BmpPixelStats.bmpBytes(2, 2, pixels)
    val topDown = bottomUp.clone()
    // height field (LE s32 at 22) := -2
    topDown(22) = (-2 & 0xff).toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    val a = statsOf(bottomUp)
    val b = statsOf(topDown)
    assert((3 to 5).forall(i => a.getLong(i) == b.getLong(i)))
    assert(b.getLong(1) == 2L)
  }

  test("non-BMP, 8-bit, compressed, and truncated payloads are null") {
    val good = BmpPixelStats.bmpBytes(2, 2, Array.fill(4)((1, 2, 3)))
    val notBmp = good.clone(); notBmp(0) = 'X'.toByte
    val eightBit = good.clone(); eightBit(28) = 8
    val rle = good.clone(); rle(30) = 1
    val truncated = good.dropRight(4)
    val hostileWidth = good.clone() // width := Int.MaxValue (3w overflows int)
    hostileWidth(18) = 0xff.toByte; hostileWidth(19) = 0xff.toByte
    hostileWidth(20) = 0xff.toByte; hostileWidth(21) = 0x7f.toByte
    val hostileHeight = good.clone() // height := Int.MinValue (abs is a no-op)
    hostileHeight(22) = 0; hostileHeight(23) = 0
    hostileHeight(24) = 0; hostileHeight(25) = 0x80.toByte
    // COMBINED hostile dims: stride·height wraps Long (2.1e9 × 1.5e9),
    // which a multiplicative bounds check would pass vacuously
    val hostileBoth = good.clone()
    hostileBoth(18) = 0x00.toByte; hostileBoth(19) = 0x2e.toByte // width 2,100,000,000 ≈ 0x7D2B7500
    hostileBoth(20) = 0x2b.toByte; hostileBoth(21) = 0x7d.toByte
    hostileBoth(22) = 0x00.toByte; hostileBoth(23) = 0x2f.toByte // height 1,500,000,000 ≈ 0x59682F00
    hostileBoth(24) = 0x68.toByte; hostileBoth(25) = 0x59.toByte
    val df = Seq(notBmp, eightBit, rle, truncated, hostileWidth,
        hostileHeight, hostileBoth, "BM".getBytes)
      .toDF("payload")
      .select(BmpPixelStats.bmpPixelStats(col("payload")).as("st"))
    assert(df.filter(col("st").isNotNull).count() == 0)
  }
}
