package graft

import graft.operators.TextAnalysis

/** Greedy bigram decoding (TextAnalysis.bigramGenerate): hand-computed
  * walks including the argmax cycle, count-then-lexicographic
  * tie-break, the frozen dead end, and the guards.
  */
class BigramGenerateSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], seeds: Seq[String], steps: Int) =
    TextAnalysis.bigramGenerate(texts.map(Tuple1(_)).toDF("text"), "text",
        seeds, steps)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("argmax walk follows counts and cycles deterministically") {
    // bigrams: (a,b):2 (b,a):1 (a,c):1 (c,a):1 -> a->b, b->a, c->a
    val out = run(Seq("a b a c a b"), Seq("a", "c"), 4)
    assert(out("a") == ((4L, "a b a b a")))
    assert(out("c") == ((4L, "c a b a b")))
  }

  test("count ties break to the lexicographically smallest next token") {
    // p->q and p->r both count 1 -> q wins
    val out = run(Seq("p q p r"), Seq("p"), 1)
    assert(out("p") == ((1L, "p q")))
  }

  test("a dead-end seed freezes with its shorter sequence") {
    val out = run(Seq("a b"), Seq("b", "zzz"), 5)
    assert(out("b") == ((0L, "b")))      // b never heads a bigram
    assert(out("zzz") == ((0L, "zzz")))  // unseen seed
    // and a live seed that hits the dead end mid-walk stops there
    assert(run(Seq("a b"), Seq("a"), 5)("a") == ((1L, "a b")))
  }

  test("guards: seeds and step bounds") {
    val df = Seq(Tuple1("a b")).toDF("text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramGenerate(df, "text", Seq.empty, 3)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramGenerate(df, "text", Seq("a"), 33)
    }
  }
}
