package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Seq((1L, "a" * 600), (2L, "xyz")).toDF("doc_id", "text"), "doc_id", "text")

  test("mediaMeta: byte sizes and chunk counts without decoding") {
    val m = Multimodal.mediaMeta(media, chunkBytes = 256)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    assert(m(1L) == ((600, 3L))) // ceil(600/256) = 3
    assert(m(2L) == ((3, 1L)))
  }

  test("sampleChunks: chunks cover the payload exactly") {
    val c = Multimodal.sampleChunks(media, chunkBytes = 256)
      .groupBy("media_id").agg(sum("chunk_bytes").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c(1L) == ((600L, 3L)))
    assert(c(2L) == ((3L, 1L)))
  }

  test("batched extraction equals per-row extraction for any batch size") {
    implicit val s = spark
    import spark.implicits._
    val ds = (0 until 50).map(i =>
      Multimodal.MediaRecord(i.toLong, "text", s"payload-$i".getBytes("UTF-8"))).toDS()
    val perRow = Multimodal.extractFeatures(ds)
      .collect().map(f => f.media_id -> f.checksum).toMap
    for (bs <- Seq(1, 7, 64, 1000)) {
      val batched = Multimodal.extractFeaturesBatched(ds, bs)
        .collect().map(f => f.media_id -> f.checksum).toMap
      assert(batched == perRow, s"batchSize=$bs")
    }
  }

  test("approx_count_distinct sketch lands within 5% of exact") {
    val out = SparkEntry.queries("q_approx_distinct")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$approx vs $exact")
    }
  }

  test("extractFeatures: per-partition batch operator is deterministic") {
    implicit val s = spark
    val ds = Seq(
      MediaRecord(1L, "text", "hello".getBytes("UTF-8")),
      MediaRecord(2L, "text", Array[Byte]())).toDS()
    val out = Multimodal.extractFeatures(ds).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 5)
    assert(out(2L).n_bytes == 0 && out(2L).checksum == 0L)
    // determinism: same input → same checksum on re-run
    val again = Multimodal.extractFeatures(ds).collect().map(f => f.media_id -> f.checksum).toMap
    assert(again(1L) == out(1L).checksum)
  }
}
