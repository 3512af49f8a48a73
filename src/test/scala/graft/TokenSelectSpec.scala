package graft

import graft.operators.TextAnalysis

/** Selective-LM token selection (TextAnalysis.tokenSelect): the
  * cross-multiplied p_src > p_glob verdict on a hand-computed corpus,
  * including the strict-inequality boundary (a token distributed
  * exactly proportionally is NOT selected) and the single-source
  * degenerate case.
  */
class TokenSelectSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed selection on a two-source corpus") {
    // src a: tokens [x x y]  (n_a = 3)
    // src b: tokens [y y z]  (n_b = 3), N = 6
    // x: c_a=2, glob=2 -> 2*6 > 2*3 selected in a (only a has x)
    // y: c_a=1, glob=3 -> 1*6 vs 3*3: 6 < 9 not selected in a
    //    c_b=2, glob=3 -> 2*6 > 3*3: 12 > 9 selected in b
    // z: c_b=1, glob=1 -> 6 > 3 selected in b
    val docs = Seq(("a", "x x y"), ("b", "y y z")).toDF("source", "text")
    val out = TextAnalysis.tokenSelect(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((3L, 2L, 666666L)))
    assert(out("b") == ((3L, 3L, 1000000L)))
  }

  test("proportional tokens sit exactly on the boundary and are excluded") {
    // both sources are the same bag: p_src == p_glob for every token,
    // the strict > never fires
    val docs = Seq(("a", "u v"), ("b", "u v")).toDF("source", "text")
    val out = TextAnalysis.tokenSelect(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 0L, "b" -> 0L))
  }

  test("a single source is the global distribution: nothing selects") {
    val docs = Seq(("only", "a b c a")).toDF("source", "text")
    val out = TextAnalysis.tokenSelect(docs, "text", "source").collect()(0)
    assert(out.getLong(1) == 4L && out.getLong(2) == 0L)
  }
}
