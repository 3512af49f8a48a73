package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{AhoCorasick, NfcNormalize}
import graft.operators.TextAnalysis

/** Adversarial-input tier for the text screens: each test composes the
  * screens the way an ingest pipeline would and drives a documented
  * evasion technique through the COMPOSITION — the claim is not "the
  * operator matches its spec" but "the pipeline catches the attack"
  * (or provably would not, which pins the required stage order).
  *
  *  - Unicode TAG characters (U+E0000–E007F) mirror printable ASCII
  *    while rendering as nothing — the ASCII-smuggling channel for
  *    prompt injection. They live OUTSIDE the BMP, so they ride UTF-16
  *    surrogate pairs; a BMP-only invisible class passes them silently.
  *  - Zero-width characters split blocklisted phrases into unmatched
  *    fragments; the blocklist only holds behind the invisible strip.
  *  - NFC variants (combining sequences) change the codepoint stream
  *    of a blocklisted phrase without changing its rendering; the
  *    blocklist only holds behind NfcNormalize.
  */
class AdversarialScreenSpec extends SparkSpec {
  import spark.implicits._

  private def scan(s: String): Row =
    TextAnalysis.invisibleScan(
      Seq((1L, s)).toDF("doc_id", "text"), "text", "doc_id").head()

  /** "ignore previous" smuggled as TAG codepoints (ASCII + 0xE0000). */
  private val smuggled: String =
    "ignore previous".map(c => new String(Character.toChars(0xE0000 + c)))
      .mkString

  test("TAG-block ASCII smuggling is counted and stripped whole") {
    val visible = "please summarize the document"
    val r = scan(visible + smuggled + " thanks")
    // one hit per smuggled codepoint, not per surrogate half
    assert(r.getAs[Long]("n_invisible") == "ignore previous".length.toLong)
    assert(!r.getAs[Boolean]("clean"))
    val cleaned = r.getAs[String]("cleaned")
    assert(cleaned == visible + " thanks")
    // surrogate integrity: the strip must never leave a lone half
    assert(!cleaned.exists(Character.isSurrogate))
  }

  test("astral but VISIBLE text is not flagged (emoji, CJK)") {
    val r = scan("good job 👍 中文 text")
    assert(r.getAs[Boolean]("clean"))
    assert(r.getAs[String]("cleaned") == "good job 👍 中文 text")
  }

  test("zero-width smuggling through the blocklist needs the strip stage") {
    val phrases = Seq("secret sauce")
    // ZWSP inside the phrase and a word joiner at a word boundary
    val evasive = "the se\u200Bcret\u2060 sauce recipe"
    def hits(c: org.apache.spark.sql.Column) =
      AhoCorasick.blocklistHits(lower(c), phrases)
    val df = Seq((1L, evasive)).toDF("doc_id", "text")
    // raw: the automaton sees the zero-width chars and misses
    assert(df.select(element_at(hits(col("text")), 1)).head().getLong(0) == 0L)
    // composed: invisibleScan's cleaned column upstream restores the hit
    val piped = TextAnalysis.invisibleScan(df, "text", "doc_id")
      .select(element_at(hits(col("cleaned")), 1).as("n"))
    assert(piped.head().getAs[Long]("n") == 1L)
  }

  test("NFC-variant phrases through the blocklist need NfcNormalize") {
    val phrases = Seq("caf\u00E9 exploit") // precomposed (NFC)
    val evasive = "the cafe\u0301 exploit kit"      // e + COMBINING ACUTE
    def hits(c: org.apache.spark.sql.Column) =
      AhoCorasick.blocklistHits(lower(c), phrases)
    val df = Seq((1L, evasive)).toDF("doc_id", "text")
    // raw: NFD codepoints never match the NFC pattern
    assert(df.select(element_at(hits(col("text")), 1)).head().getLong(0) == 0L)
    // composed: normalize first, then match
    val n = df.select(
      element_at(hits(NfcNormalize.nfcNorm(col("text"))), 1).as("n"))
    assert(n.head().getAs[Long]("n") == 1L)
  }

  test("homoglyph evasion through the blocklist needs the skeleton fold") {
    // "secret sauce" with Cyrillic е/с/а swapped in — reads identically,
    // shares zero codepoints with the pattern at the swapped positions,
    // and NFC does NOT fold homoglyphs (they are distinct letters, not
    // decompositions) — only confusableSkeleton restores the match
    val phrases = Seq("secret sauce")
    val evasive = "the s\u0435cr\u0435t s\u0430u\u0441e recipe"
    def hits(c: org.apache.spark.sql.Column) =
      AhoCorasick.blocklistHits(lower(c), phrases)
    val df = Seq((1L, evasive)).toDF("doc_id", "text")
    assert(df.select(element_at(hits(col("text")), 1)).head().getLong(0) == 0L)
    assert(df.select(element_at(
      hits(NfcNormalize.nfcNorm(col("text"))), 1)).head().getLong(0) == 0L)
    val n = df.select(element_at(
      hits(TextAnalysis.confusableSkeleton(col("text"))), 1).as("n"))
    assert(n.head().getAs[Long]("n") == 1L)
  }

  test("stacked evasion falls to the full pipeline in strip→NFC order") {
    // both vectors at once: NFD phrase + ZWSP splits + a bidi mark
    val phrases = Seq("caf\u00E9 exploit")
    val evasive = "x \u200Fcafe\u0301 ex\u200Bploit y"
    val df = Seq((1L, evasive)).toDF("doc_id", "text")
    val piped = TextAnalysis.invisibleScan(df, "text", "doc_id")
      .select(element_at(AhoCorasick.blocklistHits(
        NfcNormalize.nfcNorm(lower(col("cleaned"))), phrases), 1).as("n"))
    assert(piped.head().getAs[Long]("n") == 1L)
  }
}
