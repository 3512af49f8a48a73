package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TimeSeries
import graft.streaming.TwsOps

/** Streaming CUSUM (TwsOps.cusumTws): the O(1) incremental update of
  * the prefix-sum/prefix-min closed form must equal the batch window
  * operator on the same rows, across micro-batch splits — the
  * real-time sustained-shift alert the reference's static threshold
  * job cannot express.
  */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  // two keys: a sustained shift on "a" (alerts), noise around zero on "b"
  private val rows = Seq(
    ("a", 1L, 9L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 9L), ("a", 5L, 9L),
    ("b", 1L, 2L), ("b", 2L, -2L), ("b", 3L, 2L), ("b", 4L, -2L), ("b", 5L, 2L))
  private val driftK = 2L
  private val threshH = 6L

  private def runStream(batches: Seq[Seq[(String, Long, Long)]],
                        name: String): Seq[(String, Long, Long, Boolean)] =
    withRocksDb {
      val src = MemoryStream[(String, Long, Long)](spark)
      val q = TwsOps.cusumTws(src.toDS().toDF("key", "t", "x"),
          "key", "t", "x", driftK, threshH)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[(String, Long, Long, Boolean)]
          .collect().toSeq.sortBy(r => (r._1, r._2))
      } finally q.stop()
    }

  private def runBatch: Seq[(String, Long, Long, Boolean)] =
    TimeSeries.cusumAlerts(rows.toDF("key", "t", "x"), "key", "t", "x",
        driftK, threshH)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
      .toSeq.sortBy(r => (r._1, r._2))

  test("stream ≡ batch closed form, single batch") {
    assert(runStream(Seq(rows), "cusum_one") == runBatch)
  }

  test("stream ≡ batch across micro-batch splits") {
    assert(runStream(Seq(rows.take(4), rows.slice(4, 7), rows.drop(7)),
      "cusum_split") == runBatch)
    assert(runStream(rows.grouped(1).toSeq, "cusum_each") == runBatch)
  }

  test("the sustained shift alerts, the zero-mean noise never does") {
    val out = runStream(Seq(rows), "cusum_alerts")
    assert(out.filter(_._1 == "a").exists(_._4))
    assert(out.filter(_._1 == "b").forall(!_._4))
  }
}
