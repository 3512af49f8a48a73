package graft

import graft.operators.TextAnalysis

/** ROUGE-N overlap (TextAnalysis.rougeOverlap): hand-computed clipped
  * counts for both n, the clipping direction (a candidate repeating a
  * reference gram more often than the reference scores it once per
  * reference occurrence), the short-doc gate, and the verbatim pole.
  */
class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, k: Int) =
    TextAnalysis.rougeOverlap(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", k)
      .collect().map(r => r.getAs[Long]("n") -> r).toMap

  test("hand-computed ROUGE-1 and ROUGE-2 with clipping") {
    // k=4: ref = [a, b, a, c], cand = [a, a, b, x]
    val out = run("a b a c a a b x", 4)
    val r1 = out(1L)
    // unigrams — cand {a:2, b:1, x:1}, ref {a:2, b:1, c:1}:
    // overlap = min(2,2) + min(1,1) = 3
    assert(r1.getAs[Long]("overlap") == 3L)
    assert(r1.getAs[Long]("cand_grams") == 4L)
    assert(r1.getAs[Long]("ref_grams") == 4L)
    assert(r1.getAs[Long]("rouge_recall_bp") == 7500L)
    assert(r1.getAs[Long]("rouge_prec_bp") == 7500L)
    val r2 = out(2L)
    // bigrams — cand {a a, a b, b x}, ref {a b, b a, a c}: overlap = 1
    assert(r2.getAs[Long]("overlap") == 1L)
    assert(r2.getAs[Long]("cand_grams") == 3L)
    assert(r2.getAs[Long]("ref_grams") == 3L)
    assert(r2.getAs[Long]("rouge_recall_bp") == 3333L)
  }

  test("clipping: candidate spam of one reference gram scores it once") {
    // k=4: ref = [q, r, s, t], cand = [q, q, q, q]
    val out = run("q r s t q q q q", 4)
    assert(out(1L).getAs[Long]("overlap") == 1L) // min(4, 1)
    assert(out(1L).getAs[Long]("rouge_prec_bp") == 2500L)
    assert(out(2L).getAs[Long]("overlap") == 0L) // "q q" not in ref
  }

  test("verbatim tail scores perfect recall against an equal-size head") {
    // k=4: ref = cand = [a, b, c, d]
    val out = run("a b c d a b c d", 4)
    assert(out(1L).getAs[Long]("rouge_recall_bp") == 10000L)
    assert(out(2L).getAs[Long]("rouge_recall_bp") == 10000L)
    assert(out(2L).getAs[Long]("overlap") == 3L)
  }

  test("docs under 2k tokens emit nothing; guard rejects k < 2") {
    assert(run("too short", 4).isEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysis.rougeOverlap(Seq((1L, "x")).toDF("doc_id", "text"),
        "text", "doc_id", summaryTokens = 1)
    }
  }

  test("regression: mixed-length parquet corpus survives inferred " +
    "generate filters (ansi slice totality)") {
    // InferFiltersFromGenerate lands `size(ref) > 0` in the same
    // post-scan Filter as the length gate; with unclamped slice args
    // the ansi slice threw on every sub-32-token doc of the real
    // fixture corpus (min 10 tokens) before the gate could drop it
    val docs = graft.core.Tables.documents(spark, sf0001)
    val out = TextAnalysis.rougeOverlap(docs, "text", "doc_id", 16)
    assert(out.count() > 0)
  }
}
