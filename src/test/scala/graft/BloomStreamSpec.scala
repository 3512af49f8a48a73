package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming bloom screen (stream-static joins, stateless) must decide
  * each document exactly as the batch screen does, across micro-batch
  * boundaries.
  */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "entirely different content here"),
    (4L, "yet another corpus document"))

  private val batch = Seq(
    (101L, "The  quick brown FOX"), // normalizes to doc 1 → dup
    (102L, "completely novel text"),
    (103L, "another new document"),
    (104L, "JUMPS over the lazy dog"), // dup of doc 2
    (105L, "and one more fresh doc"))

  test("stream decisions equal the batch summary, state-free across batches") {
    val corpusDf = corpus.toDF("doc_id", "text")
    val src = MemoryStream[(Long, String)](spark)
    val q = Dedup.bloomScreenStream(
        src.toDS().toDF("doc_id", "text"), corpusDf, "text", "doc_id", 4096)
      .writeStream.format("memory").queryName("bloom_dec")
      .outputMode("append").start()
    // two micro-batches — decisions are per-row, so the split is free
    src.addData(batch.take(2): _*); q.processAllAvailable()
    src.addData(batch.drop(2): _*); q.processAllAvailable()
    q.stop()

    val dec = spark.table("bloom_dec")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(dec.length == batch.length, "one decision per streamed doc")
    // every dup is a candidate (no false negatives), dups are exact
    assert(dec.filter(_._3).map(_._1).toSet == Set(101L, 104L))
    assert(dec.filter(_._3).forall(_._2))

    // decision counts reconcile with the batch summary on the same data
    val s = Dedup.bloomScreenStats(corpusDf, batch.toDF("doc_id", "text"),
      "text", "doc_id", 4096).head()
    assert(dec.count(_._2).toLong == s.getAs[Long]("n_candidates"))
    assert(dec.count(!_._2).toLong == s.getAs[Long]("n_definitely_new"))
    assert(dec.count(_._3).toLong == s.getAs[Long]("n_true_dup"))
    assert(dec.count(d => d._2 && !d._3).toLong == s.getAs[Long]("n_false_pos"))
  }
}
