package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-aggregation for human/model-rated training data — the
  * preference-data curation step of an RLHF/classifier pipeline: many
  * raters vote a label per item; downstream training wants one row per
  * item with the consensus label and how contested it was (low
  * agreement → route to re-annotation or drop).
  *
  * All outputs are exact integers (vote counts, agreement in basis
  * points via integer division) so the result is engine-portable —
  * no floating-point consensus scores.
  *
  * Scale: one exchange on (item, label) for the vote count, then one
  * on item for the consensus pick. The per-item consensus uses the
  * bounded-heap [[graft.functions.TopKStruct]] aggregate (k=1), so the
  * second exchange carries ONE candidate row per item per map task —
  * never the full label histogram — and per-key state is O(1). A
  * million-way-contested item costs the same as a unanimous one.
  */
object Annotation {

  /** Per-item consensus: majority label (ties → lexicographically
    * smallest label, deterministic), its vote count, total votes,
    * distinct labels, and agreement = majority_n·10000 div n_votes.
    */
  def majorityVote(votes: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val counts = votes
      .groupBy(col(itemCol), col(labelCol).as("label"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy(col(itemCol))
      .agg(
        graft.functions.TopKStruct.topK(
          struct(col("cnt"), col("label")), 1, true, false).as("top"),
        sum(col("cnt")).as("n_votes"),
        count(lit(1)).as("n_labels"))
      .select(col(itemCol),
        element_at(col("top"), 1).getField("label").as("majority_label"),
        element_at(col("top"), 1).getField("cnt").as("majority_n"),
        col("n_votes"), col("n_labels"))
      .withColumn("agreement_bp", expr("majority_n * 10000 div n_votes"))
  }
}
