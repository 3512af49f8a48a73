package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Greenlist-watermark z-test (TextAnalysis.watermarkStats): token
  * fixtures are CONSTRUCTED against the same md5-parity green function
  * the operator uses, so the spec plants exact green counts and checks
  * the integer-exact z >= 2 decision at its boundaries — including the
  * minPairs gate at exactly 16.
  */
class WatermarkStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Mirror of the operator's green(prev, cur): parity of the first
    * md5 hex digit of "prev|cur" (even ASCII code = green).
    */
  private def isGreen(prev: String, cur: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$prev|$cur".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    hex.charAt(0).toInt % 2 == 0
  }

  /** Greedily extend a token chain so each consecutive pair lands on
    * the requested green/red verdict (candidates w0, w1, ... scanned
    * until one matches — parity is balanced, so a match is near).
    */
  private def plant(verdicts: Seq[Boolean]): Seq[String] = {
    val toks = scala.collection.mutable.ArrayBuffer("seed")
    verdicts.foreach { want =>
      val next = Iterator.from(0).map(i => s"w$i")
        .find(c => isGreen(toks.last, c) == want).get
      toks += next
    }
    toks.toSeq
  }

  private def rowOf(text: String) = {
    val r = TextAnalysis.watermarkStats(Seq(Tuple1(text)).toDF("text"), "text")
      .select(col("n_pairs"), col("n_green"), col("green_excess"),
        col("watermark_hit"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
  }

  test("planted all-green text at exactly minPairs = 16 pairs hits") {
    val text = plant(Seq.fill(16)(true)).mkString(" ")
    assert(rowOf(text) == ((16L, 16L, 16L, true)))
  }

  test("one pair short of the minPairs gate cannot hit, however green") {
    val text = plant(Seq.fill(15)(true)).mkString(" ")
    assert(rowOf(text) == ((15L, 15L, 15L, false)))
  }

  test("z-boundary at n = 16: 12 greens hit (excess 8, 64 >= 64), 11 miss") {
    val hit = plant(Seq.fill(12)(true) ++ Seq.fill(4)(false)).mkString(" ")
    assert(rowOf(hit) == ((16L, 12L, 8L, true)))
    val miss = plant(Seq.fill(11)(true) ++ Seq.fill(5)(false)).mkString(" ")
    assert(rowOf(miss) == ((16L, 11L, 6L, false)))
  }

  test("planted all-red text sits below the null and never hits") {
    val text = plant(Seq.fill(20)(false)).mkString(" ")
    assert(rowOf(text) == ((20L, 0L, -20L, false)))
  }

  test("natural text matches the hand-computed green count") {
    val toks = "the quick brown fox jumps over the lazy dog again and again"
      .split(" ").toSeq
    val expected = toks.sliding(2).count(p => isGreen(p(0), p(1))).toLong
    val (n, g, _, _) = rowOf(toks.mkString(" "))
    assert(n == toks.length - 1L && g == expected)
  }

  test("single-token and empty documents have zero pairs and no hit") {
    assert(rowOf("solo") == ((0L, 0L, 0L, false)))
    assert(rowOf("") == ((0L, 0L, 0L, false)))
  }
}
