package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** Luhn-validated card detection (TextAnalysis.luhnScan): checksum
  * split on classic test numbers, the 13–19 length gate, digit-run
  * boundary semantics (over-long runs are NOT candidates), and the
  * doubling edge (9·2 → 9).
  */
class LuhnScanSpec extends SparkSpec {
  import spark.implicits._

  private def scan(s: String): Row =
    TextAnalysis.luhnScan(
      Seq((1L, s)).toDF("doc_id", "text"), "text", "doc_id").head()

  test("valid and invalid cards split on the checksum, not the regex") {
    val r = scan("pay 4111111111111111 or 4111111111111112 today")
    assert(r.getAs[Long]("n_candidates") == 2L)
    assert(r.getAs[Long]("n_luhn_valid") == 1L)
    assert(r.getAs[Boolean]("has_valid_pii"))
  }

  test("length gate: a Luhn-valid 11-digit run is not a candidate") {
    // 79927398713 is THE textbook Luhn number but too short for a PAN
    val r = scan("ref 79927398713 attached")
    assert(r.getAs[Long]("n_candidates") == 0L)
    assert(!r.getAs[Boolean]("has_valid_pii"))
    // 12 digits: still short; 13 digits: in range
    assert(scan("x 123456789012 y").getAs[Long]("n_candidates") == 0L)
    assert(scan("x 1234567890123 y").getAs[Long]("n_candidates") == 1L)
  }

  test("a 20+ digit run is NOT a candidate (maximal-run boundaries)") {
    // a bare {13,19} regex would bite the first 19 digits out of this
    // 23-digit ID as a truncated "card" that can pass Luhn by chance;
    // maximal-run extraction + length filter rejects the whole run
    val r = scan("id 12345678901234567890123 end")
    assert(r.getAs[Long]("n_candidates") == 0L)
    assert(!r.getAs[Boolean]("has_valid_pii"))
    // adjacency with non-digit separators still splits into runs: a
    // 16-digit card flanked by a 20-digit ID stays detectable
    val r2 = scan("id 12345678901234567890 card 4111111111111111")
    assert(r2.getAs[Long]("n_candidates") == 1L)
    assert(r2.getAs[Long]("n_luhn_valid") == 1L)
  }

  test("doubling edge: nines double to nine (18 - 9), checksum exact") {
    // 9999999999999995: from the right, odd positions hold 9s that
    // double to 18 → 9; hand sum = 8·9 (doubled) vs raw digits
    val digits = "9999999999999995"
    val rev = digits.reverse
    val hand = rev.zipWithIndex.map { case (ch, k) =>
      val d = ch - '0'
      if (k % 2 == 0) d else { val x = 2 * d; if (x > 9) x - 9 else x }
    }.sum
    val expectValid = hand % 10 == 0
    val r = scan(s"n $digits")
    assert(r.getAs[Long]("n_candidates") == 1L)
    assert((r.getAs[Long]("n_luhn_valid") == 1L) == expectValid)
  }

  test("clean text has no candidates") {
    val r = scan("no numbers here, just words and a 42")
    assert(r.getAs[Long]("n_candidates") == 0L)
    assert(r.getAs[Long]("n_luhn_valid") == 0L)
    assert(!r.getAs[Boolean]("has_valid_pii"))
  }
}
