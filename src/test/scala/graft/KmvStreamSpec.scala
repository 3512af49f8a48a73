package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Streaming KMV distinct sketch (Sketches.kmvDistinct): the stream's
  * final state must be BIT-IDENTICAL to the batch sketch of the same
  * rows — the lossless-union property (KmvSpec) lifted across
  * micro-batch boundaries via the state store's serialize/merge path.
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32

  test("complete-mode stream sketch == batch sketch, across batches") {
    val rows = (1L to 500L).map(v => (s"g${v % 3}", v))
    val src = MemoryStream[(String, Long)](spark)
    val q = Sketches.kmvDistinct(
        src.toDS().toDF("g", "v"), "g", xxhash64(col("v")), K)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    // three uneven micro-batches, duplicates spanning batch boundaries
    src.addData(rows.take(100): _*); q.processAllAvailable()
    src.addData(rows.slice(50, 400): _*); q.processAllAvailable()
    src.addData(rows.drop(300): _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("kmv_stream")
      .select(col("g"), col("sk"), col("est_distinct")).collect()
      .map(r => (r.getString(0), r.getSeq[Long](1), r.getDouble(2))).toSet
    val batch = Sketches.kmvDistinct(
        rows.toDF("g", "v"), "g", xxhash64(col("v")), K).collect()
      .map(r => (r.getString(0), r.getSeq[Long](1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.size == 3)
    // per-group distinct is ~167 > k=32: the estimator path (not the
    // exact-below-k one) is what streaming equality just exercised
    assert(batch.forall(_._2.size == K))
  }
}
