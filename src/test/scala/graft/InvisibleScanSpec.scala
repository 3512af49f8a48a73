package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** Invisible/bidi/control-character audit (TextAnalysis.invisibleScan):
  * per-class counts over constructed payloads, the legit-whitespace
  * exemption (tab/newline/CR are NOT control hits), and the strip
  * contract -- `cleaned` carries none of the three classes and equals
  * the original when the original was clean.
  */
class InvisibleScanSpec extends SparkSpec {
  import spark.implicits._

  private def scan(s: String): Row =
    TextAnalysis.invisibleScan(
      Seq((1L, s)).toDF("doc_id", "text"), "text", "doc_id").head()

  test("zero-width class: ZWSP, ZWNJ, ZWJ, BOM, soft hyphen each count") {
    val r = scan("a\u200Bb\u200Cc\u200Dd\uFEFFe\u00ADf")
    assert(r.getAs[Long]("n_invisible") == 5L)
    assert(r.getAs[Long]("n_bidi") == 0L)
    assert(r.getAs[Long]("n_ctrl") == 0L)
    assert(!r.getAs[Boolean]("clean"))
    assert(r.getAs[String]("cleaned") == "abcdef")
  }

  test("bidi class: embeddings, overrides, isolates, marks") {
    // LRE RLE PDF LRO RLO + LRI RLI FSI PDI + LRM RLM ALM = 12 hits
    val s = "x\u202A\u202B\u202C\u202D\u202E" +
      "\u2066\u2067\u2068\u2069\u200E\u200F\u061Cy"
    val r = scan(s)
    assert(r.getAs[Long]("n_bidi") == 12L)
    assert(r.getAs[Long]("n_invisible") == 0L)
    assert(r.getAs[String]("cleaned") == "xy")
  }

  test("trojan-source shape: byte order hides behind an RLO override") {
    val r = scan("/*\u202E*/ if (admin)")
    assert(r.getAs[Long]("n_bidi") == 1L)
    assert(r.getAs[String]("cleaned") == "/**/ if (admin)")
  }

  test("ctrl class counts C0 + DEL but exempts tab, newline, CR") {
    val r = scan("a\tb\nc\rd\u0000\u0007\u007Fefg")
    assert(r.getAs[Long]("n_ctrl") == 3L) // NUL, BEL, DEL
    assert(r.getAs[Long]("n_invisible") == 0L)
    assert(r.getAs[Long]("n_bidi") == 0L)
    assert(r.getAs[String]("cleaned") == "a\tb\nc\rdefg")
  }

  test("clean ascii text is untouched and flagged clean") {
    val s = "perfectly ordinary text, with punctuation! and 123"
    val r = scan(s)
    assert(r.getAs[Boolean]("clean"))
    assert(r.getAs[Long]("n_invisible") + r.getAs[Long]("n_bidi") +
      r.getAs[Long]("n_ctrl") == 0L)
    assert(r.getAs[String]("cleaned") == s)
  }

  test("strip is idempotent: scanning cleaned output reports clean") {
    val dirty = "a\u200B\u202Eb\uFEFF"
    val once = scan(dirty).getAs[String]("cleaned")
    val r = scan(once)
    assert(r.getAs[Boolean]("clean") && r.getAs[String]("cleaned") == once)
  }
}
