package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** Chat-template render + loss-mask arithmetic (TextAnalysis.chatRender):
  * the rendered fingerprint is replayed against a hand-built string, and
  * the mask offsets are verified by SLICING that string — the offsets
  * must land exactly on assistant content.
  */
class ChatRenderSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def render(text: String, turnTokens: Int = 6): Row =
    TextAnalysis.chatRender(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", turnTokens)
      .head()

  test("three ragged turns: render replay, odd turn count is invalid") {
    val text = (1 to 13).map(i => s"w$i").mkString(" ")
    val c0 = (1 to 6).map(i => s"w$i").mkString(" ")
    val c1 = (7 to 12).map(i => s"w$i").mkString(" ")
    val expected =
      s"<|user|>$c0<|end|><|assistant|>$c1<|end|><|user|>w13<|end|>"
    val r = render(text)
    assert(r.getAs[Long]("n_turns") == 3L)
    assert(!r.getAs[Boolean]("valid"))
    assert(r.getAs[String]("fp") == md5hex(expected))
    assert(r.getAs[Long]("rendered_len") == expected.length.toLong)
    // the mask arithmetic, checked by slicing the replayed string:
    // [mask_first, mask_first + len(c1)) must be exactly c1
    val first = r.getAs[Long]("mask_first").toInt
    assert(expected.substring(first, first + c1.length) == c1)
    assert(r.getAs[Long]("mask_total") == c1.length.toLong)
  }

  test("even turn count ending in assistant is valid") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val r = render(text)
    assert(r.getAs[Long]("n_turns") == 2L)
    assert(r.getAs[Boolean]("valid"))
  }

  test("single short turn: no assistant content, invalid, sentinel offset") {
    val r = render("just five words of prompt")
    assert(r.getAs[Long]("n_turns") == 1L)
    assert(!r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("mask_total") == 0L)
    assert(r.getAs[Long]("mask_first") == -1L)
    assert(r.getAs[String]("fp") ==
      md5hex("<|user|>just five words of prompt<|end|>"))
  }

  test("empty text renders the empty conversation") {
    val r = render("")
    assert(r.getAs[Long]("n_turns") == 0L)
    assert(!r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("rendered_len") == 0L)
    assert(r.getAs[Long]("mask_total") == 0L)
    assert(r.getAs[Long]("mask_first") == -1L)
    assert(r.getAs[String]("fp") == md5hex(""))
  }

  test("turnTokens guard") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chatRender(Seq((1L, "x")).toDF("doc_id", "text"),
        "text", "doc_id", turnTokens = 0)
    }
  }
}
