package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** T5-style span corruption (TextAnalysis.spanCorrupt): hand-replayed
  * corrupted/target strings for the (d + s) mod k rule, closed-form
  * sentinel numbering across multiple masked spans, the ragged last
  * span, and the empty document.
  */
class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private def rowOf(docId: Long, text: String) = {
    val r = TextAnalysis.spanCorrupt(
        Seq((docId, text)).toDF("doc_id", "text"), "text", "doc_id",
        spanTokens = 3, everyK = 4)
      .collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getString(5), r.getString(6))
  }

  test("doc_id 0: span 0 masks, the ragged tail span survives") {
    // spans: [t1 t2 t3][t4 t5 t6][t7]; (0 + s) % 4 == 0 only at s = 0
    val (nt, ns, nms, nmt, corrupted, targets) =
      rowOf(0L, "t1 t2 t3 t4 t5 t6 t7")
    assert((nt, ns, nms, nmt) == ((7L, 3L, 1L, 3L)))
    assert(corrupted == "<extra_id_0> t4 t5 t6 t7")
    assert(targets == "<extra_id_0> t1 t2 t3")
  }

  test("doc_id 3: the masked span moves to s = 1 (closed-form r0)") {
    val (_, _, nms, nmt, corrupted, targets) =
      rowOf(3L, "t1 t2 t3 t4 t5 t6 t7")
    assert((nms, nmt) == ((1L, 3L)))
    assert(corrupted == "t1 t2 t3 <extra_id_0> t7")
    assert(targets == "<extra_id_0> t4 t5 t6")
  }

  test("sentinels increment across masked spans") {
    // 24 tokens -> 8 spans; doc 0 masks s = 0 and s = 4
    val text = (1 to 24).map(i => s"w$i").mkString(" ")
    val (nt, ns, nms, nmt, corrupted, targets) = rowOf(0L, text)
    assert((nt, ns, nms, nmt) == ((24L, 8L, 2L, 6L)))
    assert(corrupted ==
      "<extra_id_0> w4 w5 w6 w7 w8 w9 w10 w11 w12 " +
        "<extra_id_1> w16 w17 w18 w19 w20 w21 w22 w23 w24")
    assert(targets == "<extra_id_0> w1 w2 w3 <extra_id_1> w13 w14 w15")
  }

  test("a masked ragged tail counts its true token count") {
    // doc 0, 13 tokens -> 5 spans, masked s = 0 (3 toks) and s = 4 (1 tok)
    val text = (1 to 13).map(i => s"w$i").mkString(" ")
    val (_, ns, nms, nmt, corrupted, _) = rowOf(0L, text)
    assert((ns, nms, nmt) == ((5L, 2L, 4L)))
    assert(corrupted.endsWith("<extra_id_1>"))
  }

  test("empty document yields zeros and empty strings") {
    assert(rowOf(0L, "") == ((0L, 0L, 0L, 0L, "", "")))
  }

  test("unmasked documents pass through verbatim") {
    // doc 1, 3 tokens -> 1 span at s = 0; (1 + 0) % 4 != 0
    val (_, _, nms, _, corrupted, targets) = rowOf(1L, "a b c")
    assert(nms == 0L && corrupted == "a b c" && targets == "")
  }
}
