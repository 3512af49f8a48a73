package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column plumbing (E5, stubbed decode — the Spark-side
  * schema/partitioning/chunking is real) and JSON property extraction
  * over `events.props`.
  */
object MiscQueries {

  val queries: Map[String, Q] = Map(
    // Opaque-binary metadata projection: byte sizes + chunk counts
    // without ever decoding the payload.
    "q_multimodal_meta" -> ((s, d) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.mediaMeta(media, chunkBytes = 256)
        .select(col("media_id"), col("kind"),
          col("n_bytes").cast("long").as("n_bytes"), col("n_chunks"))
    }),

    // Frame/chunk sampling: explode payloads into 256-byte chunks.
    "q_multimodal_chunks" -> ((s, d) => {
      val media = Multimodal.asMediaTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleChunks(media, chunkBytes = 256)
        .select(col("media_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk_bytes").cast("long").as("chunk_bytes"))
    }),

    // E5 JSON property extraction + rollup over events.props.
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k")))
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  (octet_length(encode(text)) + 255) // 256 AS n_chunks
        |FROM documents""".stripMargin,

    "q_multimodal_chunks" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
        |           FROM documents),
        |c AS (SELECT media_id, n_bytes,
        |        unnest(generate_series(0, (n_bytes - 1) // 256)) AS chunk_idx
        |      FROM m)
        |SELECT media_id, chunk_idx,
        |  LEAST(256, n_bytes - chunk_idx * 256) AS chunk_bytes
        |FROM c""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
