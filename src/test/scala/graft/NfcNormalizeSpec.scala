package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** Native NFC normalization (TextExpressions.NfcNormalize): canonical
  * composition shrinks decomposed sequences, the already-normalized
  * fast path is a value-preserving no-op, astral-plane text survives
  * the surrogate round-trip, and nulls stay null.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NfcNormalize.nfcNorm(col("t")).as("n"))
      .collect()(0).getString(0)

  test("decomposed e + combining acute composes to precomposed e-acute") {
    val out = norm("Cafe\u0301")
    assert(out == "Caf\u00e9")
    assert(out.codePointCount(0, out.length) == 4) // 5 codepoints in
  }

  test("already-NFC text (ASCII and precomposed) is unchanged") {
    assert(norm("plain ascii text") == "plain ascii text")
    assert(norm("d\u00e9j\u00e0 vu") == "d\u00e9j\u00e0 vu")
    assert(norm("") == "")
  }

  test("astral-plane codepoints survive; composition applies around them") {
    // U+1D400 MATHEMATICAL BOLD CAPITAL A (surrogate pair) is NFC-inert;
    // the decomposed n + combining tilde next to it must still compose
    val out = norm("\uD835\uDC00 n\u0303")
    assert(out == "\uD835\uDC00 \u00f1")
    assert(out.codePointAt(0) == 0x1D400)
  }

  test("composition that shrinks the codepoint count end-to-end") {
    // a + combining ring -> a-ring; o + combining diaeresis -> o-umlaut:
    // 7 codepoints in, 5 out
    val out = norm("a\u030A b o\u0308")
    assert(out == "\u00e5 b \u00f6")
    assert(out.codePointCount(0, out.length) == 5)
  }

  test("null stays null") {
    val df = Seq(Option.empty[String]).toDF("t")
      .select(NfcNormalize.nfcNorm(col("t")).as("n"))
    assert(df.filter(col("n").isNotNull).count() == 0)
  }
}
