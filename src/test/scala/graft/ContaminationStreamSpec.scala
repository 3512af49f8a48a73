package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Streaming semantic-contamination screen: per-(candidate, benchmark)
  * hit rows from the stream must equal the batch run of the SAME
  * operator on the same data, across micro-batch boundaries (stateless
  * — every verdict is one row against the broadcast benchmark).
  */
class ContaminationStreamSpec extends SparkSpec {
  import spark.implicits._

  // benchmark: two axis-ish vectors; candidates: an exact copy (hit),
  // a 0.9-ish neighbor (hit at 0.8), an orthogonal (miss), a negated
  // copy (miss — dp < 0), and a zero vector (miss, no div-by-zero)
  private val bench = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0, 0.0)))
  private val incoming = Seq(
    (101L, Seq(1.0, 0.0, 0.0, 0.0)),
    (102L, Seq(0.9, 0.3, 0.0, 0.0)),
    (103L, Seq(0.0, 0.0, 1.0, 0.0)),
    (104L, Seq(-1.0, 0.0, 0.0, 0.0)),
    (105L, Seq(0.0, 0.0, 0.0, 0.0)))

  test("stream hits ≡ batch hits across micro-batch splits") {
    val benchDf = bench.toDF("vec_id", "embedding")
    val src = MemoryStream[(Long, Seq[Double])](spark)
    val q = Similarity.contaminationScreenStream(
        src.toDS().toDF("vec_id", "embedding"), benchDf)
      .writeStream.format("memory").queryName("contam_hits")
      .outputMode("append").start()
    src.addData(incoming.take(2): _*); q.processAllAvailable()
    src.addData(incoming.drop(2): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("contam_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.contaminationScreenStream(
        incoming.toDF("vec_id", "embedding"), benchDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)

    // the exact copy hits its benchmark twin at cos² = 10000 bp
    assert(got.contains((101L, 1L, 10000L)))
    // the 0.9-neighbor hits bench 1 (cos² = 0.81/0.90 = 9000 bp)
    assert(got.contains((102L, 1L, 9000L)))
    // orthogonal, negated, and zero vectors never hit anything
    assert(!got.exists(h => Set(103L, 104L, 105L)(h._1)))
  }
}
