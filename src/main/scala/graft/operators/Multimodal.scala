package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3 E5): media as opaque
  * `binary` payloads with typed metadata, processed by per-partition
  * batch operators.
  *
  * The decode step itself is STUBBED (deterministic fake — no
  * image/audio codecs ship in this container); everything Spark-side is
  * real and tested: the schema shape, binary columns, partitioning,
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

  private def extractOne(r: MediaRecord): MediaFeatures = {
    val sum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffffL)
    MediaFeatures(r.media_id, r.kind, r.payload.length, sum,
      // STUB decode: deterministic fake feature vector from bytes
      Array(r.payload.length.toFloat, (sum % 997).toFloat,
        (sum % 31).toFloat, (sum % 7).toFloat))
  }
}
