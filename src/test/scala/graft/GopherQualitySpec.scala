package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Gopher quality battery (TextAnalysis.gopherQuality): each rule
  * fires on a constructed offender and stays quiet on prose that
  * passes all five, with the integer cross-multiplied boundaries
  * pinned exactly.
  */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  // 63 words of stopword-bearing prose that passes every rule
  private val goodText = (("the data and the model have to be of use " +
    "with that said we scan and filter and join the rows ") * 3).trim

  private def flagsOf(text: String): Map[String, Boolean] = {
    val r = TextAnalysis.gopherQuality(
        Seq(Tuple1(text)).toDF("text"), "text", minWords = 50L)
      .select(col("flag_nwords"), col("flag_wordlen"), col("flag_symbol"),
        col("flag_alpha"), col("flag_stop"), col("keep"))
      .collect()(0)
    Seq("nwords", "wordlen", "symbol", "alpha", "stop", "keep")
      .zipWithIndex.map { case (n, i) => n -> r.getBoolean(i) }.toMap
  }

  test("clean prose passes all five rules") {
    val f = flagsOf(goodText)
    assert(f("keep"))
    assert(!f("nwords") && !f("wordlen") && !f("symbol") &&
      !f("alpha") && !f("stop"))
  }

  test("word-count rule: short docs flag, the 50-word boundary holds") {
    assert(flagsOf("too short")("nwords"))
    val exactly50 = (Seq.fill(24)("the data").mkString(" ") + " of with")
    assert(!flagsOf(exactly50)("nwords")) // 50 words: inside [50, 100k]
    val at49 = Seq.fill(49)("the").mkString(" ")
    assert(flagsOf(at49)("nwords"))
  }

  test("symbol rule: hash/ellipsis density over 10% of words flags") {
    // 10 words + 2 symbols: 2*10 > 10 -> flagged
    val symbolHeavy = goodText.split(" ").take(10).mkString(" ") + " # ..."
    assert(flagsOf(symbolHeavy)("symbol"))
    // at/below the line: 63 goodText words + 6 hashes = 69 words, 6*10 = 60 <= 69
    val atBoundary = goodText + " " + Seq.fill(6)("#").mkString(" ")
    assert(!flagsOf(atBoundary)("symbol"))
  }

  test("alpha rule: mostly-numeric docs flag at the 80% boundary") {
    // 4 alpha of 5 words: 4*5 = 20 >= 5*4 -> not flagged (exactly 80%)
    assert(!flagsOf("the data and that 42")("alpha"))
    // 3 alpha of 5: 15 < 20 -> flagged
    assert(flagsOf("the data 17 19 42")("alpha"))
  }

  test("stopword rule: fewer than two distinct Gopher stopwords flags") {
    assert(flagsOf("quick brown fox jumps over lazy dog")("stop"))
    assert(flagsOf("the quick brown fox the fox the fox")("stop")) // only 'the'
    assert(!flagsOf("the quick brown fox jumps with grace")("stop"))
  }

  test("mean-word-length rule: gibberish runs flag in both directions") {
    assert(flagsOf("a b c d e f g h i j")("wordlen")) // mean 1 < 3
    assert(flagsOf(Seq.fill(5)("pneumonoultramicroscopics").mkString(" "))
      ("wordlen")) // mean 25 > 10
  }

  test("empty document flags without dividing by zero") {
    val f = flagsOf("")
    assert(f("nwords") && !f("keep"))
  }
}
