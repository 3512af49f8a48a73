package graft

import org.apache.spark.sql.functions._
import graft.functions.{BmpPixelStats, ImageDHash}

/** Native dHash through the real BMP decode (ImageExpressions):
  * bit-exact hash replay on a 1×1-block raster, block-average scale
  * invariance, orientation invariance (bottom-up vs top-down), and the
  * decoder's strict-null contract for hostile payloads.
  */
class ImageDHashSpec extends SparkSpec {
  import spark.implicits._

  // r=g=b=v makes the ITU-R 601 luma exactly v, so the expected grid is
  // the pixel grid itself and the hash can be replayed in plain Scala
  private def gray(v: Int) = (v, v, v)

  private def grayAt(r: Int, c: Int): Int = (r * 7 + c * 13) % 251

  private def hashOf(bytes: Array[Byte]): Option[(Long, Long)] = {
    val rows = Seq(Tuple1(bytes)).toDF("payload")
      .select(ImageDHash.imageDHash(col("payload")).as("h"))
      .select(col("h.hash_hi"), col("h.hash_lo"))
      .collect()
    if (rows(0).isNullAt(0)) None else Some((rows(0).getLong(0), rows(0).getLong(1)))
  }

  private val expected: (Long, Long) = {
    var hi = 0L; var lo = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (grayAt(r, c) < grayAt(r, c + 1)) {
        val idx = r * 8 + c
        if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
      }
    (hi, lo)
  }

  test("9x8 raster (1x1 blocks) matches the bit-replayed hash") {
    val pixels = Array.tabulate(8 * 9)(i => gray(grayAt(i / 9, i % 9)))
    assert(hashOf(BmpPixelStats.bmpBytes(9, 8, pixels)).contains(expected))
  }

  test("2x2 pixel-doubled raster block-averages to the same hash") {
    // every 18x16 block of the doubled image averages to the original
    // pixel exactly — dHash's whole point is this scale invariance
    val doubled = Array.tabulate(16 * 18)(i => gray(grayAt(i / 18 / 2, i % 18 / 2)))
    assert(hashOf(BmpPixelStats.bmpBytes(18, 16, doubled)).contains(expected))
  }

  test("top-down raster (negative height) hashes identically") {
    // feed bmpBytes the row-reversed image so the FILE carries image
    // row 0 first, then flip the height sign: a top-down encoding of
    // the same picture
    val flipped = Array.tabulate(8 * 9)(i => gray(grayAt(7 - i / 9, i % 9)))
    val topDown = BmpPixelStats.bmpBytes(9, 8, flipped)
    topDown(22) = (-8 & 0xff).toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    assert(hashOf(topDown).contains(expected))
  }

  test("non-BMP, truncated, and sub-grid payloads are null; null is null") {
    val good = BmpPixelStats.bmpBytes(9, 8, Array.fill(72)(gray(7)))
    val notBmp = good.clone(); notBmp(0) = 'X'.toByte
    val truncated = good.dropRight(30)
    // 8x8 violates the width >= 9 minimum (a grid block would be empty)
    val tooNarrow = BmpPixelStats.bmpBytes(8, 8, Array.fill(64)(gray(7)))
    val df = Seq(Some(notBmp), Some(truncated), Some(tooNarrow),
        Some("BM".getBytes), None)
      .toDF("payload")
      .select(ImageDHash.imageDHash(col("payload")).as("h"))
    assert(df.filter(col("h").isNotNull).count() == 0)
  }
}
