package graft

import graft.operators.Similarity

/** MMR re-rank (Similarity.mmrRerank): the hand-computed greedy trace
  * on a constructed window where pure relevance ranking and MMR
  * disagree — the diversity penalty must demote the near-duplicate of
  * the first pick. All fixture components are exact binary fractions
  * so floor(x·1000) quantization is exact end-to-end.
  */
class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  // q=[1,0,0,0]; a1 rel 750000; a2 rel 625000 but nearly parallel to
  // a1 (dot 593750); b rel 500000 and orthogonal-ish (dot to a1 375000,
  // to a2 312500)
  private val emb = Seq(
    (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.75f, 0.25f, 0.0f, 0.0f)),
    (2L, Array(0.625f, 0.5f, 0.0f, 0.0f)),
    (3L, Array(0.5f, 0.0f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("greedy trace: relevance picks first, diversity reorders the rest") {
    val rows = Similarity.mmrRerank(emb, queryId = 100L, candK = 3, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 750000L, 0L, 750000L), // pure relevance
      (2L, 3L, 500000L, 375000L, 125000L), // b beats the a1-clone a2
      (3L, 2L, 625000L, 593750L, 31250L))) // a2 last, penalized by a1
  }

  test("relevance-only rank would have ordered a2 second (the contrast)") {
    val byRel = Similarity.mmrRerank(emb, queryId = 100L, candK = 3, k = 1)
      .collect()(0).getLong(1)
    assert(byRel == 1L)
    // rel(a2) = 625000 > rel(b) = 500000, yet MMR ranked b second above
  }

  test("window guards: candK below k and unbounded windows are refused") {
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb, queryId = 100L, candK = 2, k = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb, queryId = 100L, candK = 65, k = 5)
    }
  }
}
