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
    // the query folds the bound into its compared output (the oracle
    // asserts TRUE per group): check the verdict column here
    val out = SparkEntry.queries("q_approx_distinct")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"HLL estimate drifted past 5% for ${r.getAs[String]("event_type")}" +
          s" (exact=${r.getAs[Long]("exact_users")})")
    }
  }

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** Minimal valid PNG prefix: signature + IHDR chunk for w×h. */
  private def pngBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0)

  /** Minimal JPEG: SOI, one APP0 segment to skip, then SOF0 with h×w. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte, 0, 6, 'J', 'F', 'I', 'F') ++
      (Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8) ++
        be32(h).drop(2) ++ be32(w).drop(2) ++ Array[Byte](3, 0, 0, 0))

  /** Canonical 44-byte WAV header. */
  private def wavBytes(channels: Int, rate: Int, bits: Int): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits) ++ "data".getBytes ++ le32(0)
  }

  test("pngMeta parses real IHDR fields with byte-slice expressions only") {
    val df = Seq((1L, pngBytes(640, 480)), (2L, "not a png".getBytes))
      .toDF("media_id", "payload")
    val rows = Multimodal.pngMeta(df).collect().map(r => r.getLong(0) -> r).toMap
    val png = rows(1L)
    assert(png.getBoolean(1) && png.getLong(2) == 640L &&
      png.getLong(3) == 480L && png.getInt(4) == 8)
    val notPng = rows(2L)
    assert(!notPng.getBoolean(1) && notPng.isNullAt(2) && notPng.isNullAt(3))
  }

  test("wavMeta parses RIFF/WAVE fmt fields; non-WAV payloads get NULLs") {
    val df = Seq((1L, wavBytes(2, 44100, 16)), (2L, "definitely not a wav file".getBytes))
      .toDF("media_id", "payload")
    val rows = Multimodal.wavMeta(df).collect().map(r => r.getLong(0) -> r).toMap
    val wav = rows(1L)
    assert(wav.getBoolean(1) && wav.getInt(2) == 2 &&
      wav.getLong(3) == 44100L && wav.getInt(4) == 16)
    val notWav = rows(2L)
    assert(!notWav.getBoolean(1) && notWav.isNullAt(2) &&
      notWav.isNullAt(3) && notWav.isNullAt(4))
  }

  test("imageDimensions: real PNG IHDR + JPEG SOF marker walk") {
    implicit val s = spark
    val ds = Seq(
      MediaRecord(1L, "image", pngBytes(1920, 1080)),
      MediaRecord(2L, "image", jpegBytes(320, 200)),
      MediaRecord(3L, "text", "plain".getBytes)).toDS()
    val got = Multimodal.imageDimensions(ds).collect()
      .map(d => d.media_id -> ((d.format, d.width, d.height))).toMap
    assert(got(1L) == (("png", 1920, 1080)))
    assert(got(2L) == (("jpeg", 320, 200)))
    assert(got(3L) == (("unknown", -1, -1)))
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

  test("magic_kind classifies genuine encoder output and hand headers") {
    import graft.functions.{MagicKind, PcmStats}
    import graft.functions.BmpPixelStats
    def sniff(b: Array[Byte]) = MagicKind.sniff(b)
    // genuine containers from the library's own encoders
    assert(sniff(PcmStats.wavBytes(16000, Array[Short](1, -2, 3))) == "wav")
    assert(sniff(BmpPixelStats.bmpBytes(2, 2,
      Array.fill(4)((1, 2, 3)))) == "bmp")
    // canonical magics
    assert(sniff(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0x00)
      .map(_.toByte)) == "png")
    assert(sniff(Array(0xFF, 0xD8, 0xFF, 0xE1).map(_.toByte)) == "jpeg")
    assert(sniff("GIF89a....".getBytes("UTF-8")) == "gif")
    assert(sniff("GIF87a".getBytes("UTF-8")) == "gif")
    assert(sniff("%PDF-1.7".getBytes("UTF-8")) == "pdf")
    assert(sniff(Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte)) == "zip")
    assert(sniff(Array(0x1F, 0x8B, 0x08).map(_.toByte)) == "gzip")
    // non-matches: text, truncated magics, empty
    assert(sniff("plain text".getBytes("UTF-8")) == "other")
    assert(sniff("GIF88a".getBytes("UTF-8")) == "other")
    assert(sniff("RIFFxxxxAVI ".getBytes("UTF-8")) == "other") // RIFF, not WAVE
    assert(sniff(Array[Byte](0x89.toByte)) == "other")
    assert(sniff(Array.empty[Byte]) == "other")
  }

  test("magic_kind codegen path matches the static sniff") {
    import graft.functions.MagicKind
    import org.apache.spark.sql.functions._
    val df = Seq(
      "89504E470D0A1A0A00", "FFD8FFE0", "474946383961", "00112233"
    ).toDF("hx").select(MagicKind.of(unhex(col("hx"))).as("k"))
    assert(df.as[String].collect().toSeq ==
      Seq("png", "jpeg", "gif", "other"))
  }
}
