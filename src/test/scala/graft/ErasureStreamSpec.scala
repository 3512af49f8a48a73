package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TwsOps

/** In-stream erasure screen (TwsOps.erasureScreenTws): tombstones
  * suppress matching documents permanently, same-batch races resolve
  * to the tombstone, untombstoned traffic flows untouched, and the
  * ledger survives micro-batch boundaries.
  */
class ErasureStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Each step is (docs, tombstones) added as one micro-batch. */
  private def run(steps: Seq[(Seq[(Long, String)], Seq[Long])],
                  name: String): Seq[(Long, String)] =
    withRocksDb {
      val docs = MemoryStream[(Long, String)](spark)
      val tombs = MemoryStream[Long](spark)
      val q = TwsOps.erasureScreenTws(
          docs.toDS().toDF("doc_id", "payload"), "doc_id", "payload",
          tombs.toDS().toDF("id"), "id")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        steps.foreach { case (d, t) =>
          if (d.nonEmpty) docs.addData(d: _*)
          if (t.nonEmpty) tombs.addData(t: _*)
          q.processAllAvailable()
        }
        spark.table(name).as[(Long, String)].collect().toSeq.sorted
      } finally q.stop()
    }

  test("docs before the tombstone pass; docs after it are suppressed") {
    val out = run(Seq(
      (Seq(1L -> "v1", 2L -> "v2"), Seq.empty),
      (Seq.empty, Seq(1L)),
      (Seq(1L -> "v1-late", 2L -> "v2-again"), Seq.empty)), "er_basic")
    assert(out == Seq(1L -> "v1", 2L -> "v2", 2L -> "v2-again"))
  }

  test("a same-batch race resolves to the tombstone") {
    val out = run(Seq((Seq(7L -> "leak?"), Seq(7L))), "er_race")
    assert(out.isEmpty)
  }

  test("the ledger persists: re-arrivals many batches later still drop") {
    val out = run(Seq(
      (Seq.empty, Seq(5L)),
      (Seq(6L -> "ok"), Seq.empty),
      (Seq(5L -> "gone"), Seq.empty),
      (Seq(5L -> "still gone", 6L -> "ok2"), Seq.empty)), "er_ledger")
    assert(out == Seq(6L -> "ok", 6L -> "ok2"))
  }

  test("duplicate tombstones are idempotent") {
    val out = run(Seq(
      (Seq.empty, Seq(9L, 9L)),
      (Seq.empty, Seq(9L)),
      (Seq(9L -> "x", 10L -> "y"), Seq.empty)), "er_dup")
    assert(out == Seq(10L -> "y"))
  }
}
