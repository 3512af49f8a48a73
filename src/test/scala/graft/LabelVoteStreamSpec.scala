package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Annotation

/** Streaming majority-vote consensus must equal the batch form over
  * the votes seen so far — at EVERY micro-batch, not just the last:
  * complete-mode count snapshots + the shared consensus aggregate make
  * the streaming result a pure function of the vote multiset.
  */
class LabelVoteStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch streaming consensus equals batch majorityVote of votes so far") {
    val votes = (1 to 600).map { i =>
      ((i % 40).toLong, s"label_${(i * 13 + i / 40) % 5}")
    }
    val src = MemoryStream[(Long, String)](spark)
    val results = scala.collection.mutable.Map[Long, Set[(Long, String, Long, Long, Long, Long)]]()
    val q = Annotation.majorityVoteStream(
        src.toDS().toDF("item_id", "label"), "item_id", "label") { (df, id) =>
      results(id) = df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    }
    val chunks = votes.grouped(200).toSeq
    var seen = Seq.empty[(Long, String)]
    val expected = scala.collection.mutable.ArrayBuffer[Set[(Long, String, Long, Long, Long, Long)]]()
    chunks.foreach { c =>
      src.addData(c.toIndexedSeq: _*)
      q.processAllAvailable()
      seen = seen ++ c
      expected += Annotation.majorityVote(
          seen.toDF("item_id", "label"), "item_id", "label")
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5))).toSet
    }
    q.stop()
    // every emitted snapshot matches the batch consensus of its prefix
    val emitted = results.toSeq.sortBy(_._1).map(_._2)
    assert(emitted.size === expected.size)
    emitted.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === want, s"micro-batch $i")
    }
    assert(emitted.last.nonEmpty)
  }
}
