package graft

import org.apache.spark.sql.functions._
import graft.functions.JpegPixelStats

/** The JPEG decode tier: JDK-codec round trips land within the
  * documented error envelope (with margin below q_jpeg_pixels' 16-band
  * verdict), and the strict-null envelope holds.
  */
class JpegPixelStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(b: Array[Byte]) =
    Seq(Tuple1(b)).toDF("p")
      .select(JpegPixelStats.jpegPixelStats(col("p")).as("st"))
      .select("st.*").collect().headOption.filter(!_.anyNull)

  private def meanErr(px: Array[(Int, Int, Int)], w: Int, h: Int): Double = {
    val b = JpegPixelStats.jpegBytes(w, h, px)
    val r = stats(b).get
    assert((r.getLong(0), r.getLong(1)) == (w.toLong, h.toLong))
    val n = px.length.toDouble
    Seq(
      math.abs(r.getLong(3) - px.map(_._1.toLong).sum) / n,
      math.abs(r.getLong(4) - px.map(_._2.toLong).sum) / n,
      math.abs(r.getLong(5) - px.map(_._3.toLong).sum) / n).max
  }

  test("smooth gradient round-trips within 4/255 mean channel error") {
    val px = Array.tabulate(256)(i => (i, 255 - i, 128))
    assert(meanErr(px, 16, 16) <= 4.0)
  }

  test("fixture-shaped noise stays well inside the 16-band verdict") {
    // the q_jpeg_pixels pixel derivation, worst-case high frequency
    val px = Array.tabulate(500)(i =>
      ((i * 3) % 256, (i * 5) % 256, (i * 7 + i / 3) % 256))
    val e = meanErr(px, 2, 250)
    assert(e <= 12.0, s"mean error $e leaves <25% margin on the 16 band")
  }

  test("strict nulls: magic check, garbage, truncation, empty") {
    val good = JpegPixelStats.jpegBytes(2, 2,
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)))
    assert(stats(good).isDefined)
    assert(stats("not a jpeg at all".getBytes).isEmpty)
    assert(stats(good.take(20)).isEmpty) // truncated mid-header
    assert(stats(Array.empty[Byte]).isEmpty)
    // PNG payload is rejected by the FFD8 short-circuit
    val png = graft.functions.PngPixelStats.pngBytes(2, 2,
      Array((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)))
    assert(stats(png).isEmpty)
  }

  test("q_jpeg_pixels: every verdict TRUE on sf0.001") {
    val out = graft.queries.MiscQueries.queries("q_jpeg_pixels")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("r_within_tol"))
      assert(r.getAs[Boolean]("g_within_tol"))
      assert(r.getAs[Boolean]("b_within_tol"))
    }
  }
}
