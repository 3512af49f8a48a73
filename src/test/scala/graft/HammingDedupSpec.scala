package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** 4-band pigeonhole Hamming join (Dedup.hammingNearDuplicates): the
  * d <= 3 exactness theorem at every band boundary, the d = 4 recall
  * cliff in both of its shapes (no shared band; shared band but
  * distance-filtered), and the guard that refuses radii the pigeonhole
  * cannot certify.
  *
  * Band layout under test (bit idx = 0..63, lo carries idx < 32):
  * band0 = lo bits 0-15, band1 = lo bits 16-31, band2 = hi bits 0-15,
  * band3 = hi bits 16-31.
  */
class HammingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val baseHi = 0x12345678L
  private val baseLo = 0x9abcdef0L

  /** Flip the given global bit indices on (hi, lo). */
  private def flip(bits: Int*): (Long, Long) = {
    var hi = baseHi; var lo = baseLo
    bits.foreach { b =>
      if (b < 32) lo ^= 1L << b else hi ^= 1L << (b - 32)
    }
    (hi, lo)
  }

  private def pairsOf(other: (Long, Long)) = {
    val df = Seq(("a", baseHi, baseLo), ("b", other._1, other._2))
      .toDF("id", "hi", "lo")
    Dedup.hammingNearDuplicates(df, "id", "hi", "lo", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  test("d=3 inside one band is found with the exact distance") {
    assert(pairsOf(flip(0, 1, 2)).toSeq == Seq(("a", "b", 3L)))
  }

  test("d=3 spread over three bands is found via the untouched band") {
    // bits 15 / 16 / 47 dirty bands 0, 1, 2 — band3 alone matches
    assert(pairsOf(flip(15, 16, 47)).toSeq == Seq(("a", "b", 3L)))
  }

  test("d<=3 across each band boundary is found") {
    assert(pairsOf(flip(15, 16)).toSeq == Seq(("a", "b", 2L))) // band0|band1
    assert(pairsOf(flip(31, 32)).toSeq == Seq(("a", "b", 2L))) // lo|hi seam
    assert(pairsOf(flip(47, 48)).toSeq == Seq(("a", "b", 2L))) // band2|band3
  }

  test("d=4 with one flip per band shares no band: the recall cliff") {
    assert(pairsOf(flip(15, 31, 47, 63)).isEmpty)
  }

  test("d=4 inside one band is a candidate but distance-filtered") {
    // bands 1-3 all match, so the pair IS generated — the hamming <= 3
    // filter must still reject it
    assert(pairsOf(flip(0, 1, 2, 3)).isEmpty)
  }

  test("identical hashes pair at distance 0; radius > 3 is refused") {
    assert(pairsOf((baseHi, baseLo)).toSeq == Seq(("a", "b", 0L)))
    val df = Seq(("a", baseHi, baseLo)).toDF("id", "hi", "lo")
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDuplicates(df, "id", "hi", "lo", maxHamming = 4)
    }
  }
}
