package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming LSH near-dup screen: DISTINCT verified pairs from the
  * stream must equal the batch crossCorpusCandidates +
  * jaccardFromProfiles composition on the same data, across micro-batch
  * boundaries (stateless — every decision is per-row + static joins).
  */
class LshScreenStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "totally different words over here now"),
    (3L, "a third reference document with more words"))

  private val incoming = Seq(
    (101L, "alpha beta gamma delta epsilon zeta"),  // exact dup of 1
    (102L, "alpha beta gamma delta epsilon eta"),   // near-dup of 1
    (103L, "nothing in common with anything else"),
    (104L, "totally different words over here now")) // exact dup of 2

  test("distinct stream pairs equal the batch incremental composition") {
    val corpusDf = corpus.toDF("doc_id", "text")
    val src = MemoryStream[(Long, String)](spark)
    val q = Dedup.lshScreenStream(
        src.toDS().toDF("doc_id", "text"), corpusDf, "text", "doc_id")
      .writeStream.format("memory").queryName("lsh_pairs")
      .outputMode("append").start()
    src.addData(incoming.take(2): _*); q.processAllAvailable()
    src.addData(incoming.drop(2): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("lsh_pairs")
      .select(col("doc_id"), col("ref_id"), col("jaccard"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // batch twin: profile both sides, cross-corpus candidates, verify
    val all = (corpus ++ incoming).toDF("doc_id", "text")
    val profiles = Dedup.wordDedupProfiles(all, "text", "doc_id", 3,
      bands = 8, rowsPerBand = 2)
    val newProf = profiles.filter(col("doc_id") >= 100L)
    val refProf = profiles.filter(col("doc_id") < 100L)
    val cands = Dedup.crossCorpusCandidates(newProf, refProf, "doc_id")
    val want = Dedup.jaccardFromProfiles(profiles, cands, "doc_id")
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == want)
    // the exact dups must be present with jaccard 1.0
    assert(got.contains((101L, 1L, 1.0)) && got.contains((104L, 2L, 1.0)))
  }
}
