package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** The CMS cell table is one commutative groupBy, so the same code run
  * as a streaming aggregation must converge to the batch sketch on the
  * same events — across micro-batch boundaries, regardless of split.
  */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming cells converge to the batch sketch across micro-batches") {
    val w = 256
    val ids: Seq[Long] = (1L to 400L).map(i => i % 37) ++ Seq.fill(50)(7L)
    val batchCells = Sketches.cmsCells(ids.toDF("user_id"), "user_id", w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val src = MemoryStream[Long](spark)
    // Complete mode: the memory sink holds the CURRENT cell table each
    // trigger, not an update log — directly comparable to batch
    val q = Sketches.cmsCells(src.toDS().toDF("user_id"), "user_id", w)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    val (first, second) = ids.splitAt(123)
    src.addData(first: _*); q.processAllAvailable()
    val mid = spark.table("cms_cells").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    src.addData(second: _*); q.processAllAvailable()
    val fin = spark.table("cms_cells").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    q.stop()

    assert(fin == batchCells, "final streaming cells equal the batch sketch")
    assert(mid != batchCells, "the mid-stream table is a genuine partial")
    // monotone growth: a cell never shrinks as events arrive
    assert(mid.forall { case (k, v) => v <= fin.getOrElse(k, 0L) })
    // total mass = depth × events, in both worlds
    assert(fin.values.sum == Sketches.depth.toLong * ids.size)
  }
}
