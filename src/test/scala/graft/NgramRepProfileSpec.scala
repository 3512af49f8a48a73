package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins the native one-loop Gopher profile (NgramRepProfile) value-equal
  * to the explode→count→pivot composition it replaced, including the
  * code-point tie-break (UTF8String binary order, not UTF-16
  * compareTo) and the short-doc zero rows.
  */
class NgramRepProfileSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "solo",
    "a b a b a b c",
    "x x x x x x",
    "  leading  and   trailing   runs  ",
    "MIXED Case TOKENS mixed case tokens MIXED case",
    // astral-vs-high-BMP tie-break bait: two grams with equal counts
    // whose order differs between UTF-16 and code-point comparison
    "𐀀a q b q 𐀀a q b q",
    "a b c d e f g h i j k l m n o p",
    ("w1 w2 w3 w4 w5 " * 8).trim)

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "den", "top2_chars", "top3_chars", "top4_chars",
        "dup5_chars", "top2_ratio", "dup5_ratio")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getDouble(7))))
      .toMap

  test("native profile ≡ composed pipeline on adversarial text") {
    val d = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = canon(TextAnalysis.ngramRepetition(d, "text", "doc_id"))
    val composed = canon(TextAnalysis.ngramRepetitionComposed(d, "text", "doc_id"))
    assert(native === composed)
  }

  test("native profile ≡ composed pipeline on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val native = canon(TextAnalysis.ngramRepetition(docs, "text", "doc_id"))
    val composed = canon(TextAnalysis.ngramRepetitionComposed(docs, "text", "doc_id"))
    assert(native === composed)
  }
}
