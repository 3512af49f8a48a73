package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Fill-in-the-middle transform (TextAnalysis.fimTransform):
  * hand-replayed PSM strings for the deterministic thirds split,
  * segment-count arithmetic (n = prefix + middle + suffix always), and
  * the short/empty edge cases.
  */
class FimTransformSpec extends SparkSpec {
  import spark.implicits._

  private def rowOf(text: String) = {
    val r = TextAnalysis.fimTransform(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
  }

  test("nine tokens split into exact thirds, middle rendered last") {
    val (n, np, nm, ns, psm) = rowOf("a b c d e f g h i")
    assert((n, np, nm, ns) == ((9L, 3L, 3L, 3L)))
    assert(psm == "<PRE> a b c <SUF> g h i <MID> d e f")
  }

  test("non-multiple-of-three lengths floor the cuts (n = 7: 2/2/3)") {
    val (n, np, nm, ns, psm) = rowOf("a b c d e f g")
    assert((n, np, nm, ns) == ((7L, 2L, 2L, 3L)))
    assert(psm == "<PRE> a b <SUF> e f g <MID> c d")
  }

  test("segment counts always partition n") {
    (0 to 12).foreach { n =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val (nt, np, nm, ns, _) = rowOf(text)
      assert(nt == n.toLong && np + nm + ns == nt)
    }
  }

  test("one- and two-token docs put everything in the suffix/middle tail") {
    // n=1: cuts 0/0 -> prefix "", middle "", suffix "a"
    assert(rowOf("a") == ((1L, 0L, 0L, 1L, "<PRE>  <SUF> a <MID> ")))
    // n=2: cuts 0/1 -> middle "a", suffix "b"
    assert(rowOf("a b") == ((2L, 0L, 1L, 1L, "<PRE>  <SUF> b <MID> a")))
  }

  test("empty doc renders the bare sentinel skeleton") {
    assert(rowOf("") == ((0L, 0L, 0L, 0L, "<PRE>  <SUF>  <MID> ")))
  }
}
