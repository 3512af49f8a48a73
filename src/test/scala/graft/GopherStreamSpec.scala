package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming Gopher-quality screen: gopherQuality is a stateless
  * projection, so its verdicts on a stream must equal the batch run of
  * the SAME operator on the same rows, across micro-batch boundaries —
  * the ingest-time quality gate shape (filter documents before they
  * ever land in the corpus).
  */
class GopherStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, ("the data and the model have to be of use " +
      "with that said we scan and filter and join the rows ") * 3),
    (2L, "too short"),
    (3L, Seq.fill(60)("12345").mkString(" ")), // numeric: alpha rule
    (4L, ""))

  test("stream verdicts ≡ batch verdicts across micro-batch splits") {
    val src = MemoryStream[(Long, String)](spark)
    val q = TextAnalysis.gopherQuality(
        src.toDS().toDF("doc_id", "text"), "text")
      .select(col("doc_id"), col("flag_nwords"), col("flag_alpha"),
        col("flag_stop"), col("keep"))
      .writeStream.format("memory").queryName("gopher_screen")
      .outputMode("append").start()
    src.addData(docs.take(2): _*); q.processAllAvailable()
    src.addData(docs.drop(2): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("gopher_screen").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    val want = TextAnalysis.gopherQuality(
        docs.toDF("doc_id", "text"), "text")
      .select(col("doc_id"), col("flag_nwords"), col("flag_alpha"),
        col("flag_stop"), col("keep"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(got == want)
    // the prose doc survives, the offenders are flagged
    assert(got.contains((1L, false, false, false, true)))
    assert(got.exists(r => r._1 == 2L && r._2 && !r._5))
    assert(got.exists(r => r._1 == 3L && r._3 && !r._5))
  }
}
