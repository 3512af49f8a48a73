package graft

import org.apache.spark.sql.functions._
import graft.functions.PngPixelStats

/** The PNG pixel decoder: full deflate→filter→inflate→unfilter round
  * trips (every predictor), chunked IDAT, and the strict-null paths
  * (CRC corruption, truncation, wrong color type, zip-bomb dims).
  */
class PngPixelStatsSpec extends SparkSpec {
  import spark.implicits._

  private def pix(n: Int): Array[(Int, Int, Int)] =
    (0 until n).map(i => ((i * 37) % 256, (i * 91) % 256, (i * 13 + 7) % 256))
      .toArray

  private def stats(b: Array[Byte]) =
    Seq(Tuple1(b)).toDF("p")
      .select(PngPixelStats.pngPixelStats(col("p")).as("st"))
      .select("st.*").collect().headOption.filter(!_.anyNull)

  private def expected(px: Array[(Int, Int, Int)], w: Int, h: Int) =
    (w.toLong, h.toLong, w.toLong * h,
      px.map(_._1.toLong).sum, px.map(_._2.toLong).sum, px.map(_._3.toLong).sum)

  test("round trip is the identity under EVERY filter, single and cycled") {
    val px = pix(24) // 4x6 raster
    for (f <- 0 to 4) {
      val b = PngPixelStats.pngBytes(4, 6, px, _ => f)
      val r = stats(b).get
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) == expected(px, 4, 6), s"filter $f")
    }
    val cycled = PngPixelStats.pngBytes(4, 6, px) // default: row % 5
    val r = stats(cycled).get
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ==
      (px.map(_._1.toLong).sum, px.map(_._2.toLong).sum, px.map(_._3.toLong).sum))
  }

  test("IDAT split across chunks decodes (builder splits when long enough)") {
    // 600 pixels deflate to well over 16 bytes -> two IDAT chunks
    val px = pix(600)
    val b = PngPixelStats.pngBytes(3, 200, px)
    // count IDAT occurrences in the raw bytes
    val needle = "IDAT".getBytes("US-ASCII")
    val n = b.sliding(4).count(_.sameElements(needle))
    assert(n == 2, s"expected chunked IDAT, got $n chunk(s)")
    assert(stats(b).get.getLong(2) == 600L)
  }

  test("strict nulls: corrupt CRC, truncation, bad signature, filter byte") {
    val good = PngPixelStats.pngBytes(2, 2, pix(4))
    assert(stats(good).isDefined)
    // flip one byte inside IHDR data -> CRC mismatch
    val crcBad = good.clone(); crcBad(16) = (crcBad(16) ^ 0x01).toByte
    assert(stats(crcBad).isEmpty)
    // truncate mid-chunk
    assert(stats(good.take(good.length - 7)).isEmpty)
    // bad signature
    val sigBad = good.clone(); sigBad(0) = 0x00
    assert(stats(sigBad).isEmpty)
    // non-PNG garbage and empty
    assert(stats(Array[Byte](1, 2, 3)).isEmpty)
    assert(stats(Array.empty[Byte]).isEmpty)
  }

  test("strict nulls: wrong color type / bit depth / interlace via forged IHDR") {
    def forge(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = PngPixelStats.pngBytes(2, 2, pix(4)).clone()
      mut(b)
      // recompute the IHDR CRC so only the FIELD is wrong, not the CRC
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      val v = crc.getValue
      b(29) = ((v >> 24) & 0xff).toByte; b(30) = ((v >> 16) & 0xff).toByte
      b(31) = ((v >> 8) & 0xff).toByte; b(32) = (v & 0xff).toByte
      b
    }
    assert(stats(forge(_(25) = 6.toByte)).isEmpty) // color type RGBA
    assert(stats(forge(_(24) = 16.toByte)).isEmpty) // bit depth 16
    assert(stats(forge(_(28) = 1.toByte)).isEmpty) // Adam7 interlace
  }

  test("zip-bomb guard: huge declared dims refuse before allocating") {
    val b = PngPixelStats.pngBytes(2, 2, pix(4)).clone()
    // forge width = 2^24, height = 2^24 (raster 3*2^48 bytes) + fix CRC
    val bb = java.nio.ByteBuffer.wrap(b)
    bb.putInt(16, 1 << 24); bb.putInt(20, 1 << 24)
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13)
    bb.putInt(29, crc.getValue.toInt)
    assert(stats(b).isEmpty)
  }

  test("q_png_pixels runs green end-to-end on sf0.001") {
    val out = graft.queries.MiscQueries.queries("q_png_pixels")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("width") == 2L)
      assert(r.getAs[Long]("n_pixels") == 2 * r.getAs[Long]("height"))
    }
  }
}
