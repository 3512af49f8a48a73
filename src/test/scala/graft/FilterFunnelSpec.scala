package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Filter-chain attrition funnel (TextAnalysis.filterFunnel): hand-
  * computed first-fail attribution, the disjoint-partition invariant
  * (stage drops + survivors == total), ordering sensitivity, and the
  * all-pass / all-fail edges.
  */
class FilterFunnelSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, c) flag triples per doc
  private val docs = Seq(
    (false, false, false), // survives
    (true, true, false),   // attributed to a (first fail wins)
    (false, true, true),   // attributed to b
    (false, false, true),  // attributed to c
    (true, false, false),  // attributed to a
    (false, false, false)) // survives

  test("hand-computed attribution with cumulative drops and survivors") {
    val df = docs.toDF("a", "b", "c")
    val out = TextAnalysis.filterFunnel(df, Seq("a", "b", "c"))
      .orderBy("stage")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", 2L, 2L, 4L),
      (2L, "b", 1L, 3L, 3L),
      (3L, "c", 1L, 4L, 2L)))
  }

  test("stage drops plus survivors partition the corpus") {
    val df = docs.toDF("a", "b", "c")
    val out = TextAnalysis.filterFunnel(df, Seq("a", "b", "c"))
      .orderBy("stage").collect()
    assert(out.map(_.getLong(2)).sum + out.last.getLong(4) == docs.size)
  }

  test("stage order changes attribution, never the survivor count") {
    val df = docs.toDF("a", "b", "c")
    val rev = TextAnalysis.filterFunnel(df, Seq("c", "b", "a"))
      .orderBy("stage").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // docs (f,t,t) and (f,f,t) now attribute to c, (t,t,f) to b,
    // (t,f,f) still to a
    assert(rev.toSeq == Seq(("c", 2L), ("b", 1L), ("a", 1L)))
    assert(TextAnalysis.filterFunnel(df, Seq("c", "b", "a"))
      .orderBy("stage").collect().last.getLong(4) == 2L)
  }

  test("all-pass corpus drops nothing; all-fail drops everything at stage 1") {
    val pass = Seq((false, false), (false, false)).toDF("a", "b")
    val outP = TextAnalysis.filterFunnel(pass, Seq("a", "b"))
      .orderBy("stage").collect()
    assert(outP.map(_.getLong(2)).toSeq == Seq(0L, 0L) &&
      outP.last.getLong(4) == 2L)
    val fail = Seq((true, true), (true, false)).toDF("a", "b")
    val outF = TextAnalysis.filterFunnel(fail, Seq("a", "b"))
      .orderBy("stage").collect()
    assert(outF.map(_.getLong(2)).toSeq == Seq(2L, 0L) &&
      outF.last.getLong(4) == 0L)
  }

  test("empty flag list is rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.filterFunnel(Seq((true, false)).toDF("a", "b"), Seq.empty)
    }
  }
}
