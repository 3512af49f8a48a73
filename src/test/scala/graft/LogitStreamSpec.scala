package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TextAnalysis

/** The hashing-trick quality classifier is a pure projection, so it
  * must stream verbatim: per-row logits and decisions identical to the
  * batch run, independent of micro-batch boundaries, with no state.
  */
class LogitStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, ""),
    (3L, "lorem ipsum dolor sit amet consectetur"),
    (4L, "Mixed CASE and   irregular   spacing here"),
    (5L, "zzz qqq xxx unusual vocabulary tokens"))

  test("stream logits equal batch logits across micro-batch splits") {
    val src = MemoryStream[(Long, String)](spark)
    val q = TextAnalysis.hashedLinearScore(
        src.toDS().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("logit_dec")
      .outputMode("append").start()
    src.addData(docs.take(2): _*); q.processAllAvailable()
    src.addData(docs.drop(2): _*); q.processAllAvailable()
    // a stateless screen keeps zero state-store rows
    assert(q.recentProgress.forall(_.stateOperators.isEmpty))
    q.stop()

    val streamed = spark.table("logit_dec").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val batch = TextAnalysis.hashedLinearScore(
        docs.toDF("doc_id", "text"), "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(streamed == batch)
  }
}
