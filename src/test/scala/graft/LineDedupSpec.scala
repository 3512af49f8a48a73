package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** CCNet-style line dedup (TextAnalysis.lineDedup): boilerplate lines
  * above the corpus df cap are dropped, survivors reassemble in
  * document order, and the degenerate documents (empty text,
  * all-lines-dropped) land on the documented zero/empty contract.
  *
  * Fixture uses lineTokens = 2, so every two whitespace tokens form one
  * "line" — small enough to hand-compute every df.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // "cookie banner" appears in 3 docs (df = 3 > 2: dropped);
  // "privacy box" in 2 (df = 2 <= 2: kept); the rest are unique
  private val docs = Seq(
    (1L, "alpha beta cookie banner gamma delta"),
    (2L, "cookie banner privacy box epsilon zeta"),
    (3L, "cookie banner"),
    (4L, ""),
    (5L, "privacy box")
  ).toDF("doc_id", "text")

  private val out = TextAnalysis
    .lineDedup(docs, "text", "doc_id", lineTokens = 2, maxLineDf = 2L)
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
    .toMap

  test("boilerplate above the df cap is dropped, survivors kept in order") {
    // doc 1: lines [alpha beta][cookie banner][gamma delta] -> middle drops
    assert(out(1L) == ((3L, 2L, "alpha beta gamma delta")))
    // doc 2: boilerplate first line drops, order of the rest preserved
    assert(out(2L) == ((3L, 2L, "privacy box epsilon zeta")))
  }

  test("a document that is all boilerplate keeps zero lines, empty text") {
    assert(out(3L) == ((1L, 0L, "")))
  }

  test("an empty document is counted with zero lines and empty text") {
    assert(out(4L) == ((0L, 0L, "")))
  }

  test("a df-boundary line (df == maxLineDf) is kept everywhere") {
    assert(out(5L) == ((1L, 1L, "privacy box")))
  }

  test("every input document appears exactly once in the output") {
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }
}
