package graft

import org.apache.spark.sql.functions._
import graft.functions.EfKernel
import graft.operators.TextAnalysis

/** Greedy extractive-fragment statistics (ExtractiveFragments /
  * TextAnalysis.extractiveCoverage): hand-traced walks incl. the
  * greedy-vs-optimal distinction, verbatim and zero-overlap poles,
  * and the operator's split/guard behavior.
  */
class ExtractiveFragmentsSpec extends SparkSpec {
  import spark.implicits._

  private def ef(art: Seq[String], summ: Seq[String]): Seq[Long] =
    Seq((art, summ)).toDF("a", "s")
      .select(EfKernel.extractiveFragments(col("a"), col("s")))
      .head().getSeq[Long](0)

  test("hand-traced walk: two fragments, one miss") {
    // i=1: 'a b' (len 2) | 'q' misses | 'c d x' (len 3)
    assert(ef(Seq("a", "b", "c", "d", "x", "y"),
      Seq("a", "b", "q", "c", "d", "x")) == Seq(5L, 13L, 2L, 6L))
  }

  test("verbatim summary is one fragment with quadratic density") {
    assert(ef(Seq("p", "q", "r", "s"), Seq("q", "r", "s")) ==
      Seq(3L, 9L, 1L, 3L))
  }

  test("zero overlap and empty summary") {
    assert(ef(Seq("w", "w"), Seq("z", "z", "z")) == Seq(0L, 0L, 0L, 3L))
    assert(ef(Seq("w"), Seq.empty) == Seq(0L, 0L, 0L, 0L))
  }

  test("greedy takes the longest run at each step, not the optimal split") {
    // art has 'a b c' and 'b c d'; greedy grabs 'a b c' then lone 'd'
    // (sq = 9 + 1), where the optimal-density split 'a b'+'c d' gives 8
    assert(ef(Seq("a", "b", "c", "b", "c", "d"), Seq("a", "b", "c", "d")) ==
      Seq(4L, 10L, 2L, 4L))
  }

  test("repeated summary token matches every time (fragments re-anchor)") {
    assert(ef(Seq("x"), Seq("x", "x", "x")) == Seq(3L, 3L, 3L, 3L))
  }

  test("extractiveCoverage splits tail vs head and guards short docs") {
    val doc = (1 to 16).map(i => s"w$i") // 16 head tokens
    val tail = (1 to 16).map(i => s"w$i") // tail repeats the head verbatim
    val text = (doc ++ tail).mkString(" ")
    val short = (1 to 31).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.extractiveCoverage(
      Seq((1L, text), (2L, short)).toDF("doc_id", "text"),
      "text", "doc_id", summaryTokens = 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 1) // the 31-token doc has no 16/16 split
    val r = out(1L)
    assert(r.getAs[Long]("matched_tokens") == 16L)
    assert(r.getAs[Long]("density_num") == 256L)
    assert(r.getAs[Long]("n_fragments") == 1L)
    assert(r.getAs[Long]("n_summary") == 16L)
    assert(r.getAs[Long]("coverage_bp") == 10000L)
  }
}
