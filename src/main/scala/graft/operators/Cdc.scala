package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the lakehouse MERGE: fold a
  * changelog of row images into a base snapshot.
  *
  * Contract: `changes` carries the base schema plus a monotone
  * per-change sequence column (CDC offset / LSN) and an op column;
  * the LATEST change per key wins (upsert row image replaces the base
  * row, `deleteOp` removes it), keys never mentioned stay, change keys
  * absent from the base insert. `seqCol` must be unique per key (true
  * of any real CDC offset) — equal sequence numbers would make the
  * winning image an arbitrary pick.
  *
  * Plan shape: one window sort keyed by the merge key resolves
  * latest-per-key (the same CDC-compaction shape as `q_latest_per_key`),
  * then a left-anti join drops superseded base rows and a union appends
  * the surviving images. Everything is keyed — one shuffle per side,
  * no broadcast of anything unbounded; at 100 TB this is the standard
  * daily MERGE of a changelog into a snapshot partition.
  */
object Cdc {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   seqCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc(seqCol))
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val dataCols = base.columns.toSeq
    val upserts = latest.filter(col(opCol) =!= deleteOp)
      .select(dataCols.map(col): _*)
    base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Snapshot diff — the incremental-training question "what changed
    * since the last corpus cut?": classify every key across two corpus
    * snapshots as added / removed / changed / unchanged by content
    * hash. One row per key.
    *
    * Plan shape: each side reduces to (key, md5(payload)) BEFORE the
    * shuffle, so the full-outer join moves 32-byte digests, never
    * document bodies — at 100 TB the payload column stays pruned out of
    * the scan entirely except to hash. One keyed shuffle per side, no
    * window, no broadcast of anything unbounded. Downstream, `added ∪
    * changed` is exactly the re-process set an incremental pipeline
    * feeds forward.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, payloadCol: String): DataFrame = {
    val a = oldSnap.select(col(keyCol).as("k"), md5(col(payloadCol)).as("ha"))
    val b = newSnap.select(col(keyCol).as("k"), md5(col(payloadCol)).as("hb"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") === col("hb"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
