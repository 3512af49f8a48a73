package graft

import org.apache.spark.sql.functions._
import graft.functions.GifPixelStats

/** The GIF LZW decoder: real compressed round trips (dictionary
  * chains, the KwKwK first-code-reuse edge, width growth, overflow
  * clear), extension skipping, and the strict-null envelope.
  */
class GifPixelStatsSpec extends SparkSpec {
  import spark.implicits._

  // palette[0] = black so padding never shifts sums
  private def pal(n: Int): Array[(Int, Int, Int)] =
    (0 until n).map(i =>
      if (i == 0) (0, 0, 0)
      else ((i * 37) % 256, (i * 91) % 256, (i * 13 + 7) % 256)).toArray

  private def stats(b: Array[Byte]) =
    Seq(Tuple1(b)).toDF("p")
      .select(GifPixelStats.gifPixelStats(col("p")).as("st"))
      .select("st.*").collect().headOption.filter(!_.anyNull)

  private def sums(p: Array[(Int, Int, Int)], idx: Array[Int]) =
    (idx.map(i => p(i)._1.toLong).sum, idx.map(i => p(i)._2.toLong).sum,
      idx.map(i => p(i)._3.toLong).sum)

  test("round trip: repeating pattern builds real dictionary chains") {
    val p = pal(16)
    val idx = Array.tabulate(400)(i => (i % 7 + i / 50) % 16) // repetitive
    val b = GifPixelStats.gifBytes(20, 20, p, idx)
    val r = stats(b).get
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (20L, 20L, 400L))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == sums(p, idx))
  }

  test("round trip: KwKwK edge (aaa... forces code == nextCode)") {
    val p = pal(4)
    val idx = Array.fill(64)(3) // all-same runs hit the just-added code
    val r = stats(GifPixelStats.gifBytes(8, 8, p, idx)).get
    assert(r.getLong(2) == 64L)
    assert(r.getLong(3) == 64L * p(3)._1)
  }

  test("round trip: dictionary overflow forces a mid-stream clear") {
    // highly non-repetitive stream over a 256-color palette: dictionary
    // passes 4096 entries, encoder emits clear, decoder must resync
    val p = pal(256)
    val idx = Array.tabulate(30000)(i => ((i * 131) ^ (i >> 3)) & 0xff)
    val b = GifPixelStats.gifBytes(150, 200, p, idx)
    val r = stats(b).get
    assert(r.getLong(2) == 30000L)
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == sums(p, idx))
  }

  test("89a extension blocks are skipped; 87a and 89a both accepted") {
    val p = pal(8)
    val idx = Array.tabulate(12)(_ % 8)
    val base = GifPixelStats.gifBytes(4, 3, p, idx)
    assert(stats(base).isDefined)
    // splice a graphics-control extension after the GCT, flip to 89a
    val gctEnd = 13 + 8 * 3
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(gctEnd) ++ ext ++ base.drop(gctEnd)
    spliced(4) = '9'.toByte // GIF89a
    val r = stats(spliced).get
    assert(r.getLong(2) == 12L)
  }

  test("strict nulls: signature, truncation, trailer, bad index, local CT") {
    val p = pal(8)
    val idx = Array.tabulate(12)(_ % 8)
    val good = GifPixelStats.gifBytes(4, 3, p, idx)
    assert(stats(good).isDefined)
    val sig = good.clone(); sig(0) = 'X'.toByte
    assert(stats(sig).isEmpty)
    assert(stats(good.take(good.length - 2)).isEmpty) // no trailer
    assert(stats(good.take(20)).isEmpty)
    val lct = good.clone(); lct(13 + 24 + 9) = 0x80.toByte // local CT flag
    assert(stats(lct).isEmpty)
    assert(stats(Array.empty[Byte]).isEmpty)
  }

  test("q_gif_pixels runs green end-to-end on sf0.001") {
    val out = graft.queries.MiscQueries.queries("q_gif_pixels")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_pixels") ==
      2 * r.getAs[Long]("height")))
  }
}
