package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming invisible-character screen: invisibleScan is a stateless
  * projection, so its verdicts on a stream must equal the batch run on
  * the same rows across micro-batch boundaries — the ingest-time
  * content-hygiene gate (quarantine bidi/zero-width payloads before
  * they enter the corpus).
  */
class InvisibleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "clean prose stays clean"),
    (2L, "zero\u200Bwidth\u200Cpayload"),
    (3L, "bidi /*\u202E*/ trick"),
    (4L, "ctrl\u0007byte"),
    (5L, ""))

  test("stream verdicts ≡ batch verdicts across micro-batch splits") {
    val src = MemoryStream[(Long, String)](spark)
    val q = TextAnalysis.invisibleScan(
        src.toDS().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("invisible_screen")
      .outputMode("append").start()
    src.addData(docs.take(2): _*); q.processAllAvailable()
    src.addData(docs.drop(2): _*); q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_invisible"),
        r.getAs[Long]("n_bidi"), r.getAs[Long]("n_ctrl"),
        r.getAs[String]("cleaned"), r.getAs[Boolean]("clean"))
    val got = spark.table("invisible_screen").collect().map(key).toSet
    val want = TextAnalysis.invisibleScan(
      docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(key).toSet
    assert(got == want)
    assert(got.contains((1L, 0L, 0L, 0L, "clean prose stays clean", true)))
    assert(got.contains((2L, 2L, 0L, 0L, "zerowidthpayload", false)))
    assert(got.contains((3L, 0L, 1L, 0L, "bidi /**/ trick", false)))
    assert(got.contains((4L, 0L, 0L, 1L, "ctrlbyte", false)))
  }
}
