package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("textStats on a known string") {
    val d = Seq((1L, "Hello, world! Hello again.")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(d, "text", "doc_id").head()
    assert(r.getAs[Int]("n_chars") == 26)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_distinct_tokens") == 4) // "hello," ≠ "hello" — all 4 distinct
    assert(r.getAs[Int]("n_punct") == 3) // , ! .
  }

  test("languageId: marker-dominant language wins; no markers → und") {
    val d = Seq(
      (1L, "the cat and the dog is a friend of mine"),
      (2L, "der hund und die katze ist das tier"),
      (3L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("fingerprint: invariant to case and whitespace runs") {
    val d = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("qualityScore tiers are ordered by the CASE chain") {
    val d = Seq(
      (1L, "unique distinct varied words compose sentences"), // high ttr, long tokens
      (2L, "a a a a a a a a b b")).toDF("doc_id", "text")     // low ttr
    val out = TextAnalysis.qualityScore(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("quality")).toMap
    assert(out(1L) == "high")
    assert(out(2L) == "low")
  }
}
