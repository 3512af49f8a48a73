package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowFingerprints
import graft.operators.Dedup

/** Winnowing fingerprints (functions.WinnowFingerprints +
  * Dedup.winnowDuplicates): the density guarantee (every window has a
  * selection), the matching theorem (shared substrings of length
  * >= w + k - 1 share a fingerprint), the rightmost tie-break, the
  * mod-free hash replay, and the no-full-window empty contract.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  private def fpsOf(text: String): Seq[(Int, Long)] =
    Seq(Tuple1(text)).toDF("t")
      .select(explode(WinnowFingerprints.winnowFingerprints(col("t"), K, W))
        .as("fp"))
      .select(col("fp.pos"), col("fp.h"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

  /** The documented mod-free polynomial: sum cp(i+j)*31^(k-1-j). */
  private def hashAt(text: String, pos1: Int): Long =
    (0 until K).map(j => text.codePointAt(pos1 - 1 + j).toLong *
      math.pow(31, K - 1 - j).toLong).sum

  test("selected hashes replay the documented polynomial exactly") {
    val t = "the quick brown fox jumps"
    fpsOf(t).foreach { case (pos, h) => assert(h == hashAt(t, pos)) }
  }

  test("density guarantee: every w-window of positions has a selection") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789 the quick brown fox"
    val sel = fpsOf(t).map(_._1).toSet
    val p = t.length - (K - 1)
    (1 to p - W + 1).foreach { wstart =>
      assert((wstart until wstart + W).exists(sel.contains),
        s"window at $wstart has no selected position")
    }
  }

  test("matching theorem: shared substring of length w+k-1 shares a fingerprint") {
    // 11-char copied block inside otherwise-different documents
    val copied = "GRAFT-BLOCK"
    assert(copied.length == W + K - 1)
    val a = s"left context $copied and more after"
    val b = s"totally different lead-in $copied zzz"
    val ha = fpsOf(a).map(_._2).toSet
    val hb = fpsOf(b).map(_._2).toSet
    assert((ha & hb).nonEmpty)
  }

  test("rightmost minimal hash wins ties: uniform text selects every window tail") {
    // all k-grams of "aaaa..." hash identically, so each window picks
    // its rightmost position: w, w+1, ..., p
    val t = "a" * 15 // p = 8 positions
    val p = t.length - (K - 1)
    assert(fpsOf(t).map(_._1) == (W to p).toList)
  }

  test("texts without a full window fingerprint to the empty array") {
    assert(fpsOf("a" * (W + K - 2)).isEmpty) // p = w-1: no full window
    assert(fpsOf("short").isEmpty)
    assert(fpsOf("").isEmpty)
  }

  test("k > 8 is refused (int64-exactness bound)") {
    intercept[IllegalArgumentException] {
      WinnowFingerprints.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("x" * 32), 9, 4)
    }
  }

  test("winnowDuplicates pairs documents sharing a long copied block") {
    val boiler = "this exact sentence is copied between documents verbatim"
    val docs = Seq(
      (1L, s"first document body $boiler trailing text one"),
      (2L, s"second body with other words $boiler end two"),
      (3L, "no shared content here at all just unique words qqq")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowDuplicates(docs, "text", "doc_id",
        k = K, w = W, maxDf = 20L, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("df-capped boilerplate fingerprints do not pair") {
    // the same block in 25 docs exceeds maxDf=20: all pairs vanish.
    // Prefixes are single-letter runs so every k-gram is either fully
    // inside the common text (df = 25, capped) or touches the per-doc
    // letter (df = 1, unshareable) — no df in [2, 20] can exist.
    val docs = (0 until 25)
      .map(i => ((i + 1).toLong,
        ('a' + i).toChar.toString * 10 + " shared COMMON-BLOCK-XYZ tail"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowDuplicates(docs, "text", "doc_id",
      k = K, w = W, maxDf = 20L, minShared = 1L)
    assert(pairs.count() == 0)
  }
}
