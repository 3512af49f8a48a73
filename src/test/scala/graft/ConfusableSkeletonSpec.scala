package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Unicode-confusables skeleton (TextAnalysis.confusableSkeleton):
  * Cyrillic/Greek homoglyphs and fullwidth forms fold to ASCII, pure
  * ASCII is untouched, and two visually-identical spoofs collide on
  * the skeleton while differing as raw strings — the dedup-evasion
  * case the fold exists for.
  */
class ConfusableSkeletonSpec extends SparkSpec {
  import spark.implicits._

  private def skel(s: String): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.confusableSkeleton(col("t")))
      .collect()(0).getString(0)

  test("cyrillic homoglyphs fold to their ascii lookalikes") {
    // "сорa" spelled with Cyrillic es/o/er + Latin a
    val spoof = "сорa"
    assert(spoof != "copa")
    assert(skel(spoof) == "copa")
  }

  test("fullwidth latin and digits fold") {
    val wide = "ａｂｃ１２" // ａｂｃ１２
    assert(skel(wide) == "abc12")
  }

  test("pure ascii is unchanged") {
    val s = "the quick brown fox 123 {with} punctuation!"
    assert(skel(s) == s)
  }

  test("spoofed duplicates collide on the skeleton, not on the raw text") {
    val genuine = "free money open account"
    val spoofed = "free mоney оpen accоunt" // Cyrillic o
    assert(genuine != spoofed)
    assert(skel(genuine) == skel(spoofed))
  }

  test("the fold table is 1:1 (from/to lengths agree, no dup sources)") {
    assert(TextAnalysis.confusableFrom.length ==
      TextAnalysis.confusableTo.length)
    assert(TextAnalysis.confusableFrom.distinct.length ==
      TextAnalysis.confusableFrom.length)
    // every target is printable ascii
    assert(TextAnalysis.confusableTo.forall(c => c >= ' ' && c <= '~'))
  }
}
