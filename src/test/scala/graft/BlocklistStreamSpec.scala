package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.AhoCorasick

/** Streaming blocklist screen: BlocklistHits is a stateless native
  * expression, so its counts on a stream must equal the batch run on
  * the same rows across micro-batch boundaries — the ingest-time
  * content-policy gate (screen documents before they land), and the
  * proof that the plan-time-built automaton serializes cleanly into
  * streaming tasks.
  */
class BlocklistStreamSpec extends SparkSpec {
  import spark.implicits._

  private val phrases = Seq("bad phrase", "spam")
  private val docs = Seq(
    (1L, "a clean document"),
    (2L, "spam and more spam with one bad phrase"),
    (3L, "bad phrasebad phrase"), // adjacent occurrences both count
    (4L, ""))

  private def screen(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      AhoCorasick.blocklistHits(col("text"), phrases).as("hits"))

  test("stream counts ≡ batch counts across micro-batch splits") {
    val src = MemoryStream[(Long, String)](spark)
    val q = screen(src.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("blocklist_screen")
      .outputMode("append").start()
    src.addData(docs.take(2): _*); q.processAllAvailable()
    src.addData(docs.drop(2): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("blocklist_screen").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    val want = screen(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(got == want)
    assert(got.contains((1L, Seq(0L, 0L))))
    assert(got.contains((2L, Seq(1L, 2L))))
    assert(got.contains((3L, Seq(2L, 0L))))
    assert(got.contains((4L, Seq(0L, 0L))))
  }
}
