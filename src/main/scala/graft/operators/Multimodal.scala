package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3 E5): media as opaque
  * `binary` payloads with typed metadata, processed by per-partition
  * batch operators.
  *
  * Header-level metadata extraction is REAL (PNG/WAV byte-slice
  * expressions [[pngMeta]]/[[wavMeta]], the JPEG SOF marker walk
  * [[imageDimensions]]) — and as of round 8 so is PIXEL/SAMPLE decode
  * for every fixture format: PCM16 WAV ([[graft.functions.PcmStats]]),
  * 24-bit BMP ([[graft.functions.BmpPixelStats]]), PNG via JDK zlib
  * ([[graft.functions.PngPixelStats]]), GIF via a hand-rolled LZW
  * ([[graft.functions.GifPixelStats]]) and baseline JPEG via the JDK's
  * own imageio codec ([[graft.functions.JpegPixelStats]]), each gated
  * end-to-end by an encode→decode oracle (exact for the lossless four,
  * tolerance-verdict for lossy JPEG). The generic `decodeFeatures`
  * deterministic-fake path below remains only as the stand-in shape
  * for codecs that DON'T ship here (video/audio beyond PCM).
  * Everything Spark-side is real
  * and tested: the schema shape, binary columns, partitioning,
  * batch-iterator operator signature (`mapPartitions`, the Scala
  * analogue of `mapInPandas`-style batch UDFs), and frame/chunk
  * explosion.
  *
  * Scale notes: payloads stay opaque until the last possible operator
  * (no decode before filter), metadata columns drive pruning, and the
  * batch operator processes an iterator per partition — constant memory,
  * model-handle reuse across rows, no per-row setup cost.
  */
object Multimodal {

  /** A media row: opaque payload + the typed metadata that drives
    * partition pruning and filtering without touching bytes.
    */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (the stub emits deterministic values derived
    * from payload bytes; a real deploy swaps `extractBatch`'s body).
    */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, feature: Array[Float])

  /** Attach a binary payload column to a text table — the fixture stand-
    * in for reading real media blobs (UTF-8 bytes are the payload).
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit("text").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Metadata projection without decoding: byte size, chunk count at
    * `chunkBytes`. Runs at scan speed; this is what filters should
    * touch, never the payload.
    */
  def mediaMeta(media: DataFrame, chunkBytes: Int = 256): DataFrame =
    media.select(col("media_id"), col("kind"),
      octet_length(col("payload")).as("n_bytes"),
      expr(s"(octet_length(payload) + ${chunkBytes - 1}) div $chunkBytes").as("n_chunks"))

  /** Frame/chunk sampling: explode the payload into fixed-size byte
    * chunks (frame-extraction plan shape; `substring` on binary is a
    * codegen'd byte slice).
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int = 256): DataFrame =
    media
      .select(col("media_id"),
        explode(sequence(lit(0),
          expr(s"(octet_length(payload) - 1) div $chunkBytes"))).as("chunk_idx"),
        col("payload"))
      .select(col("media_id"), col("chunk_idx"),
        expr(s"substring(payload, chunk_idx * $chunkBytes + 1, $chunkBytes)").as("chunk"))
      .withColumn("chunk_bytes", octet_length(col("chunk")))

  /** The batch feature-extraction operator: per-partition iterator →
    * iterator, mirroring a batched model-inference UDF. The DECODE/MODEL
    * part is a deterministic stub (byte checksum + 4 fake features);
    * the operator contract — open model once per partition, stream
    * batches, constant memory — is the real thing.
    */
  def extractFeatures(media: Dataset[MediaRecord])
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec/model handle here
      it.map(extractOne)
    }
  }

  /** Batched variant — the model-inference batch shape (`mapInPandas`
    * analogue): the partition iterator is consumed in fixed-size
    * batches, each batch goes through "the model" as one call, results
    * stream out flattened. Still constant memory (one batch in flight
    * per partition); batch size is the GPU/throughput knob.
    */
  def extractFeaturesBatched(media: Dataset[MediaRecord], batchSize: Int = 64)
                            (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // model handle opened once per partition here
      it.grouped(batchSize).flatMap { batch =>
        // STUB batched inference: one vectorized call per batch
        batch.map(extractOne)
      }
    }
  }

  /** REAL (non-stub) image metadata from PNG headers as pure byte-slice
    * expressions — no UDF, no codec: the PNG signature is a literal
    * compare and IHDR width/height are fixed-offset big-endian u32s
    * (`hex`+`conv` on a 4-byte slice). This is the "metadata without
    * decode" tier: dimension filters run at scan speed over opaque
    * blobs; only rows that survive go anywhere near a decoder.
    */
  def pngMeta(media: DataFrame): DataFrame = {
    val sig = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val isPng = expr("substring(payload, 1, 8)") === sig
    // fields are NULL for non-PNG payloads (a short blob would otherwise
    // yield empty slices → garbage conversions)
    def beU32(off: Int) = when(isPng,
      conv(hex(expr(s"substring(payload, $off, 4)")), 16, 10).cast("long"))
    media.select(col("media_id"), isPng.as("is_png"),
      beU32(17).as("width"), beU32(21).as("height"),
      when(isPng, conv(hex(expr("substring(payload, 25, 1)")), 16, 10).cast("int"))
        .as("bit_depth"))
  }

  /** RIFF/WAVE header fields, same expression-only tier: little-endian
    * u16/u32 assembled from per-byte hex windows at the CANONICAL
    * fmt-chunk offsets (fmt immediately after "WAVE", no LIST/JUNK
    * chunks first — no chunk walk; the typed [[imageDimensions]] tier is
    * where walking lives). Fields are NULL unless the payload passes the
    * RIFF/WAVE signature check AND the chunk at the canonical offset is
    * actually "fmt " — mirroring [[pngMeta]]'s non-PNG behavior instead
    * of emitting garbage for foreign payloads.
    */
  def wavMeta(media: DataFrame): DataFrame = {
    def byteAt(off: Int) =
      conv(hex(expr(s"substring(payload, $off, 1)")), 16, 10).cast("long")
    def leU16(off: Int) = byteAt(off) + byteAt(off + 1) * 256L
    def leU32(off: Int) = leU16(off) + leU16(off + 2) * 65536L
    val isWav = expr("substring(payload, 1, 4)") === lit("RIFF".getBytes) &&
      expr("substring(payload, 9, 4)") === lit("WAVE".getBytes) &&
      expr("substring(payload, 13, 4)") === lit("fmt ".getBytes)
    media.select(col("media_id"), isWav.as("is_wav"),
      when(isWav, leU16(23).cast("int")).as("channels"),
      when(isWav, leU32(25)).as("sample_rate"),
      when(isWav, leU16(35).cast("int")).as("bits_per_sample"))
  }

  final case class MediaDims(media_id: Long, format: String, width: Int, height: Int)

  /** Typed image-dimension extraction with a REAL parser: PNG IHDR at
    * fixed offsets; JPEG by walking the marker stream to the first SOF
    * frame header (the part of "decoding" that needs no codec — it reads
    * a few dozen bytes per blob). Unknown formats report ("unknown",
    * -1, -1) instead of failing the partition.
    */
  def imageDimensions(media: Dataset[MediaRecord])
                     (implicit spark: SparkSession): Dataset[MediaDims] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => parseDims(r.media_id, r.payload)))
  }

  private[operators] def parseDims(id: Long, b: Array[Byte]): MediaDims = {
    def u8(i: Int) = b(i) & 0xff
    def beU16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def beU32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      MediaDims(id, "png", beU32(16).toInt, beU32(20).toInt)
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: segments are (0xFF, marker, beU16 length incl. itself);
      // SOF0..SOF15 (except DHT/DAC/RST) carry precision, height, width
      var i = 2
      while (i + 9 < b.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) return MediaDims(id, "jpeg", beU16(i + 7), beU16(i + 5))
        i += 2 + beU16(i + 2)
      }
      MediaDims(id, "jpeg", -1, -1)
    } else MediaDims(id, "unknown", -1, -1)
  }

  private def extractOne(r: MediaRecord): MediaFeatures = {
    val sum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
    MediaFeatures(r.media_id, r.kind, r.payload.length, sum,
      // STUB decode: deterministic fake feature vector from bytes
      Array(r.payload.length.toFloat, (sum % 997).toFloat,
        (sum % 31).toFloat, (sum % 7).toFloat))
  }
}
