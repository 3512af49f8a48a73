package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing, TextAnalysis}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packBins global offsets match a serial prefix sum across buckets") {
    // ids 0..99, lengths 1..100; bucketWidth 16 forces 7 buckets, so any
    // offset bug between buckets shows up against the serial reference
    val rows = (0L until 100L).map(i => (i, i + 1))
    val out = Packing.packBins(rows.toDF("id", "len"), "id", "len",
      capacity = 50, bucketWidth = 16)
      .select("id", "start_off", "bin").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    var off = 0L
    rows.foreach { case (id, len) =>
      assert(out(id) == ((off, off / 50)), s"doc $id")
      off += len
    }
  }

  test("packBins: doc straddling a bin boundary belongs to its start bin") {
    // len 30 each, capacity 50: doc1 starts at offset 30 -> bin 0
    // (overflows into bin 1's range but is atomic), doc2 starts at 60 -> bin 1
    val out = Packing.packBins(
      Seq((0L, 30L), (1L, 30L), (2L, 30L)).toDF("id", "len"),
      "id", "len", capacity = 50, bucketWidth = 2)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L))
  }

  test("packReport aggregates per bin") {
    val rep = Packing.packReport(
      Seq((0L, 40L), (1L, 40L), (2L, 40L)).toDF("id", "len"),
      "id", "len", capacity = 50, bucketWidth = 100)
      .orderBy("bin").collect()
    // starts 0, 40, 80 -> bins 0, 0, 1
    assert(rep.length == 2)
    assert(rep(0).getLong(1) == 2 && rep(0).getLong(2) == 80)
    assert(rep(1).getLong(1) == 1 && rep(1).getLong(2) == 40)
  }

  test("chunkTokens: short doc is one full-copy chunk") {
    val out = TextAnalysis.chunkTokens(
      Seq((1L, "a b c")).toDF("id", "text"), "text", "id", 64, 48).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 0 && out(0).getLong(2) == 3)
  }

  test("chunkTokens: stride windows overlap and cover the tail") {
    // 100 tokens, window 64, stride 48 -> chunks at 0 and 48; second has 52
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunkTokens(
      Seq((1L, text)).toDF("id", "text"), "text", "id", 64, 48)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(out.map(_.getLong(2)).toSeq == Seq(64L, 52L))
    // boundary: 112 tokens = 64 + 48 exactly -> still 2 chunks
    val t2 = (1 to 112).map(i => s"t$i").mkString(" ")
    assert(TextAnalysis.chunkTokens(
      Seq((1L, t2)).toDF("id", "text"), "text", "id", 64, 48).count() == 2)
    // 113 -> third chunk with the single tail token
    val t3 = (1 to 113).map(i => s"t$i").mkString(" ")
    val c3 = TextAnalysis.chunkTokens(
      Seq((1L, t3)).toDF("id", "text"), "text", "id", 64, 48)
      .orderBy("chunk_id").collect()
    assert(c3.length == 3 && c3(2).getLong(2) == 17)
  }

  test("clusterSurvivors keeps the best-scoring member per component") {
    // chain 1~2, 2~3 is ONE cluster; doc 2 has the best score
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 10L), (2L, 99L), (3L, 50L), (4L, 7L)).toDF("doc_id", "score")
    val out = Dedup.clusterSurvivors(docs, pairs, "doc_id", "score").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 2L &&
      r.getLong(3) == 99L)
  }

  test("clusterSurvivors ties break to the least id") {
    val pairs = Seq((5L, 6L)).toDF("id_a", "id_b")
    val docs = Seq((5L, 10L), (6L, 10L)).toDF("doc_id", "score")
    val out = Dedup.clusterSurvivors(docs, pairs, "doc_id", "score").collect()
    assert(out(0).getLong(2) == 5L)
  }

  test("paddingWaste: power-of-two buckets, floor bucket, exact accounting") {
    // lengths: 3 and 16 land in the 16 floor bucket; 17 is the first in
    // 32; 32 stays in 32 (exact power); 33 -> 64; 100 -> 128
    val out = Packing.paddingWaste(
      Seq(3L, 16L, 17L, 32L, 33L, 100L).toDF("n_tok"), "n_tok")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(16L) == ((2L, 19L, 13L, (19L * 10000) / 32)))
    assert(out(32L) == ((2L, 49L, 15L, (49L * 10000) / 64)))
    assert(out(64L) == ((1L, 33L, 31L, (33L * 10000) / 64)))
    assert(out(128L) == ((1L, 100L, 28L, (100L * 10000) / 128)))
  }
}
