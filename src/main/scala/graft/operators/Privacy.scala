package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Differentially-private aggregate release — the privacy-preserving
  * statistics step of a training-data pipeline (publishing per-group
  * corpus counts / clipped sums without exposing individual records).
  *
  * Mechanism: BINOMIAL noise (Dwork et al., "Our Data, Ourselves:
  * Privacy via Distributed Noise Generation", EUROCRYPT 2006 — the
  * binomial mechanism), not Laplace: noise = popcount(h) − N/2 where h
  * is N fair bits, giving (ε, δ)-DP for counting queries with
  * ε ≈ sensitivity·√(2·ln(1.25/δ))/σ, σ² = N/4. Chosen deliberately
  * over Laplace for this library because it is INTEGER-EXACT: no
  * ln/exp in the sampling path, so the released values are
  * bit-identical on any engine (a Laplace inverse-CDF draw would
  * inherit 1-ulp libm divergence between the JVM and C runtimes — the
  * same cross-engine hazard SCALE.md documents for double aggregates).
  *
  * Noise seeding is per-GROUP (md5 of salt + group key), never
  * per-row: re-running the release reproduces the same noise
  * (idempotent publication — a fresh draw per run would let an
  * observer average the noise away), and adding one record moves a
  * noisy count by exactly 1 (the sensitivity the ε-accounting
  * assumes). The salt rotates per release epoch.
  *
  * PRIVACY PRECONDITIONS the caller owns — the mechanism is only as
  * private as these hold:
  *  - the SALT IS A SECRET of the releasing party. The noise is a
  *    deterministic function of (salt, group key); publishing the salt
  *    (or reusing a guessable one) lets any consumer recompute and
  *    subtract the noise exactly. The shipped demo queries publish
  *    their salt in the oracle SQL because their role is ENGINE
  *    verification (the oracle must reproduce the release
  *    bit-for-bit), not privacy — a real deployment treats the salt
  *    like a key.
  *  - only groups present in the data appear in the release, so group
  *    KEY MEMBERSHIP itself leaks regardless of noise; release over a
  *    fixed public key domain (left-join the domain, noise the empty
  *    groups too) when membership is sensitive.
  *
  * Scale: one hash-partitioned aggregation per release — the noise is
  * a scalar expression over the GROUP row (|groups| evals, not
  * |rows|), so DP costs nothing on top of the underlying groupBy.
  */
object Privacy {

  /** popcount(60 salted hash bits) − 30: integer binomial(60, ½) noise
    * centered at 0, σ² = 15. 60 bits = 15 md5 hex chars, which parse
    * into a non-negative BIGINT on every engine.
    */
  private def binomialNoise(salt: String, groupCols: Seq[Column]): Column =
    bit_count(conv(substring(md5(
      concat_ws("|", lit(salt) +: groupCols: _*)), 1, 15), 16, 10)
      .cast(LongType)) - lit(30)

  /** DP per-group counts: (groupCols..., noisy_count). Sensitivity 1
    * (one record moves one group's count by one).
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String],
               salt: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .withColumn("noisy_count",
        (col("_n") + binomialNoise(salt, groupCols.map(col))).cast(LongType))
      .select(groupCols.map(col) :+ col("noisy_count"): _*)

  /** DP per-group sums of a CLIPPED, micro-quantized value:
    * contributions clamp to [clipLo, clipHi] in integer micro-units
    * (the clip bounds the sensitivity; quantization keeps the release
    * integer-exact), noise scales by the add/remove-one-record
    * sensitivity max(|clipLo|, |clipHi|, clipHi − clipLo): because NULL
    * rows contribute 0, the per-record contribution set is
    * {0} ∪ [clipLo, clipHi], so when the clip range does not straddle 0
    * (e.g. [50, 100]) removing one record can move the sum by
    * max(|clipLo|, |clipHi|) — more than the range width.
    * NULL values contribute 0 — NOT the clip ceiling (least/greatest
    * skip NULLs on every engine, so an unguarded clamp would turn each
    * NULL row into a phantom clipHi contribution).
    * Output: (groupCols..., noisy_sum_q) in micro-units.
    */
  def dpSumQuantized(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     clipLo: Long, clipHi: Long, scale: Long,
                     salt: String): DataFrame = {
    val sensitivity = math.max(math.max(math.abs(clipLo), math.abs(clipHi)),
      clipHi - clipLo)
    val q = when(col(valueCol).isNull, lit(0L))
      .otherwise(greatest(lit(clipLo), least(lit(clipHi),
        floor(col(valueCol) * scale).cast(LongType))))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(q).as("_s"))
      .withColumn("noisy_sum_q",
        (col("_s") + binomialNoise(salt, groupCols.map(col)) *
          lit(sensitivity)).cast(LongType))
      .select(groupCols.map(col) :+ col("noisy_sum_q"): _*)
  }

  /** Right-to-be-forgotten erasure cascade: given ONE tombstone set of
    * record ids, apply the SAME anti-join to every derived table that
    * carries the id (raw docs, embeddings, any index/feature table)
    * and publish the per-table accounting — total, erased, kept — so
    * an auditor can see the cascade reached every surface. A GDPR/CCPA
    * deletion that removes the document but leaves its embedding in
    * the ANN index hasn't deleted anything; the single-tombstone-frame
    * contract is the point.
    *
    * `tables` is (name, frame, idColumn) — heterogeneous schemas
    * welcome; only the id column is touched. Returns the accounting
    * frame; [[erase]] returns the cascaded (kept-rows) frame for one
    * table so callers materialize the cleaned corpus with the same
    * anti-join the accounting counted.
    *
    * Scale: the tombstone set broadcasts (deletion batches are small
    * against a 100 TB corpus — and if one ever isn't, Spark falls back
    * to a shuffled anti-join on its own); each table is scanned ONCE,
    * counting kept and erased in the same aggregate rather than
    * anti-joining twice.
    */
  def erasureCascade(tables: Seq[(String, DataFrame, String)],
                     tombstones: DataFrame, tombIdCol: String): DataFrame = {
    require(tables.nonEmpty, "need at least one table to cascade over")
    val tomb = broadcast(
      tombstones.select(col(tombIdCol).cast("long").as("tomb_id")).distinct())
    tables.map { case (name, df, idCol) =>
      df.select(col(idCol).cast("long").as("rid"))
        .join(tomb, col("rid") === col("tomb_id"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("tomb_id").isNotNull, 1L).otherwise(0L)).as("n_erased"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("n_erased"), (col("n_rows") - col("n_erased")).as("n_kept"))
    }.reduce(_ unionAll _)
  }

  /** The cascade applied: kept rows of one table under the same
    * tombstone frame (broadcast left-anti join).
    */
  def erase(df: DataFrame, idCol: String, tombstones: DataFrame,
            tombIdCol: String): DataFrame =
    df.join(
      broadcast(tombstones.select(col(tombIdCol).cast("long").as("tomb_id"))
        .distinct()),
      col(idCol).cast("long") === col("tomb_id"), "left_anti")
}
